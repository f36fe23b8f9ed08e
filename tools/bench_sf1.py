"""Order-of-magnitude scale probe (VERDICT r4 item 5): build + serve at
sf1-equivalent size — 2M docs x ~2KB (~4 GB content), 10x the per-round
bench — recording the metrics every scale claim rides on:

  - wall time + docs/s for single-pass AND segmented builds (the
    crossover re-measured at this scale)
  - total shuffle bytes and the MAX single exchange (Spark UI REST —
    one giant exchange is what kills a 10^12-doc build)
  - postings-stage skew_ratio from the build manifest (hot-term salting
    effectiveness at 10x the vocabulary pressure)
  - peak executor memory (REST peakMemoryMetrics)
  - BM25 serving p50 cold/warm + 20-query batch on the 2M-doc index
    (latency must stay ~constant in corpus size: the plan is
    bucket-pruned + term-pushdown scanned)

    python tools/bench_sf1.py [n_docs] [segmented_waves]

Writes one JSON object to stdout (pipe to bench/sf1_probe_r05.json).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from tools.bench_shuffle import stage_shuffle_bytes  # noqa: E402


def _peak_mem(spark) -> dict:
    app = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/executors"
    ) as r:
        execs = json.load(r)
    peak = {}
    for e in execs:
        for k, v in (e.get("peakMemoryMetrics") or {}).items():
            peak[k] = max(peak.get(k, 0), int(v))
    return {
        "jvm_heap_gb": round(peak.get("JVMHeapMemory", 0) / 2**30, 2),
        "jvm_offheap_gb": round(peak.get("JVMOffHeapMemory", 0) / 2**30, 2),
        "execution_gb": round(
            (peak.get("OnHeapExecutionMemory", 0)
             + peak.get("OffHeapExecutionMemory", 0)) / 2**30, 2
        ),
        "storage_gb": round(
            (peak.get("OnHeapStorageMemory", 0)
             + peak.get("OffHeapStorageMemory", 0)) / 2**30, 2
        ),
        "python_worker_gb": round(
            peak.get("ProcessTreePythonRSSMemory", 0) / 2**30, 2
        ),
    }


def _manifest_metrics(index_dir: str) -> dict:
    out = {}
    with open(os.path.join(index_dir, "manifest.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("stage") == "postings":
                out["skew_ratio"] = round(rec.get("skew_ratio", 0), 2)
                out["postings_sec"] = round(rec.get("secs", 0), 1)
            if rec.get("stage") == "docs":
                out["docs_sec"] = round(rec.get("secs", 0), 1)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from esbulk_spark.config import IndexConfig
    from esbulk_spark.corpus import synth_corpus
    from esbulk_spark.plans.build import build_index
    from esbulk_spark.plans.reader import IndexReader
    from esbulk_spark.session import get_spark
    from bench import REF_QUERIES, _canary

    spark = get_spark(
        app_name="esbulk-sf1-probe",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n_docs, "cpus": os.cpu_count()}

    corpus_dir = f"/tmp/esbulk_bench_corpus2k_{n_docs}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_corpus(spark, n_docs, seed=42).write.mode("overwrite").parquet(
            corpus_dir
        )
    corpus = spark.read.parquet(corpus_dir)
    from pyspark.sql import functions as F

    out["content_gb"] = round(
        corpus.agg(F.sum(F.length("content"))).collect()[0][0] / 2**30, 2
    )

    # JIT warmup so the first measured build isn't compile-bound
    shutil.rmtree("/tmp/sf1_warm", ignore_errors=True)
    build_index(
        spark, synth_corpus(spark, 3000, seed=7),
        IndexConfig(index_dir="/tmp/sf1_warm", n_buckets=8, n_shards=2),
        input_sig="warm",
    )
    shutil.rmtree("/tmp/sf1_warm", ignore_errors=True)

    idx_dir = f"/tmp/sf1_idx_{n_docs}"
    for variant, seg in (("single_pass", None), (f"segmented{waves}", waves)):
        d = idx_dir if seg is None else f"{idx_dir}_seg"
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(d + ".segments", ignore_errors=True)
        canary = _canary(spark)
        before = stage_shuffle_bytes(spark)
        t0 = time.monotonic()
        stats = build_index(
            spark, corpus,
            IndexConfig(index_dir=d, n_buckets=32, n_shards=32,
                        chunk_cap=1 << 17, segmented=seg),
            input_sig=f"sf1-{n_docs}-{variant}",
        )
        secs = round(time.monotonic() - t0, 1)
        new = [
            v for k, v in stage_shuffle_bytes(spark).items()
            if k not in before
        ]
        out[variant] = {
            "wall_sec": secs,
            "docs_per_sec": round(n_docs / secs, 1),
            "canary_sec": canary,
            "total_postings": stats["total_postings"],
            "total_shuffle_gb": round(sum(new) / 2**30, 2),
            "max_exchange_gb": round(max(new, default=0) / 2**30, 2),
            "n_exchanges": sum(1 for b in new if b > 0),
            "peak_memory": _peak_mem(spark),
            **_manifest_metrics(d),
        }
        print(json.dumps({variant: out[variant]}), flush=True)
        if seg is not None:
            shutil.rmtree(d, ignore_errors=True)

    # serving latency on the 2M-doc index (constant-in-corpus-size claim)
    reader = IndexReader(spark, idx_dir)
    with reader.interactive():
        reader.search_rows(REF_QUERIES[0], k=10)  # warm
        lat = []
        for q in REF_QUERIES:
            t0 = time.monotonic()
            reader.search_rows(q, k=10, prune=True)
            lat.append(time.monotonic() - t0)
        out["bm25_p50_sec"] = round(statistics.median(lat), 3)
        lat_w = []
        for q in REF_QUERIES:
            t0 = time.monotonic()
            reader.search_rows(q, k=10, prune=True)
            lat_w.append(time.monotonic() - t0)
        out["bm25_p50_warm_sec"] = round(statistics.median(lat_w), 3)
        t0 = time.monotonic()
        reader.search_many(
            {f"q{i}": q for i, q in enumerate(REF_QUERIES)}, k=10
        ).collect()
        out["bm25_batch20_sec"] = round(time.monotonic() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
