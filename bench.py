"""Per-round benchmark. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-item sec...}, "sf": <sf>, ...throughput extras}

Workload (mirrors BASELINE.md's target metrics):
  1. index-build throughput on the input_hint-shaped synthetic corpus
     (docs/sec + postings/sec — the reference's headline metric,
     measurements.csv:1-9)
  2. BM25 top-10 latency p50 over a 20-query reference set on the
     built index (block-max pruned), warm
  3. the heavier driver-contract queries over $SPARK_GRAFT_SF_DIR

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_N_DOCS (override corpus size), BENCH_MODE=build_only
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_QUERIES = [
    "getUserName", "get_user_name", "parse_token_5 mergeList",
    "flushBuffer retry score", "return", "getuserbuffer44 scan_value_87",
    "return getValue0", "def func class", "readClient writeServer",
    "batchCount", "index_shard_9", "scanNode mergeBlock flushList",
    "token buffer", "searchResult25", "score_value_11 getDoc",
    "for while else", "import var", "buildConfig readResult",
    "setName7 parse_doc_88", "client server config",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_docs = int(os.environ.get("BENCH_N_DOCS", str(max(2000, int(500_000 * sf)))))
    mode = os.environ.get("BENCH_MODE", "full")

    from esbulk_spark.config import IndexConfig
    from esbulk_spark.corpus import synth_corpus
    from esbulk_spark.plans.build import build_index
    from esbulk_spark.plans.reader import IndexReader
    from esbulk_spark.session import get_spark

    spark = get_spark(app_name="esbulk-bench", cpus=cpus, shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    out: dict = {"sf": sf, "cpus": cpus, "n_docs": n_docs}
    t_total0 = time.monotonic()

    # ---- 1. index build throughput (synthetic input_hint corpus) ----
    # corpus materialization is NOT timed: the reference reads an existing
    # file (run.go:269-283); we index an existing parquet table.
    tmpdir = os.environ.get("BENCH_TMPDIR", "/tmp")
    corpus_dir = f"{tmpdir}/esbulk_bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_corpus(spark, n_docs, seed=42).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    out["corpus_bytes"] = sum(
        f.stat().st_size for f in os.scandir(corpus_dir) if f.is_file()
    )
    idx_dir = f"{tmpdir}/esbulk_bench_index_{cpus}_{n_docs}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    cfg = IndexConfig(index_dir=idx_dir, n_buckets=32, n_shards=8, chunk_cap=1 << 17)
    t0 = time.monotonic()
    stats = build_index(spark, corpus, cfg, input_sig=f"bench{n_docs}")
    t_build = time.monotonic() - t0
    queries["index_build"] = round(t_build, 3)
    out["build_docs_per_sec"] = round(n_docs / t_build, 1)
    out["build_postings_per_sec"] = round(stats["total_postings"] / t_build, 1)
    out["total_postings"] = stats["total_postings"]

    if mode == "build_only":
        out.update(
            metric="index-build docs/sec + BM25 top-10 p50 (see extras)",
            value=round(time.monotonic() - t_total0, 3), unit="sec", queries=queries,
        )
        print(json.dumps(out))
        spark.stop()
        return

    # ---- 2. BM25 top-10 latency over the reference query set ----
    reader = IndexReader(spark, idx_dir)
    reader.search(REF_QUERIES[0], k=10).collect()  # warm
    lat = []
    for i, q in enumerate(REF_QUERIES):
        t0 = time.monotonic()
        reader.search(q, k=10, prune=True).collect()
        dt = time.monotonic() - t0
        lat.append(dt)
        queries[f"bm25_q{i:02d}"] = round(dt, 3)
    out["bm25_p50_sec"] = round(statistics.median(lat), 3)
    out["bm25_mean_sec"] = round(statistics.mean(lat), 3)
    # batch path: all 20 queries in one job (the cluster-scale pattern)
    t0 = time.monotonic()
    reader.search_many({f"q{i}": q for i, q in enumerate(REF_QUERIES)}, k=10).collect()
    queries["bm25_batch20"] = round(time.monotonic() - t0, 3)

    # ---- 3. driver-contract queries over sf_dir ----
    from esbulk_spark.entry_queries import QUERIES

    for name in [
        "dictionary_top100", "bm25_topk_wand", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "simhash_fingerprint", "embedding_cosine_topk",
        "agg_lineitem_pricing", "events_hourly_window", "optype_index_lww",
    ]:
        fn, _ = QUERIES[name]
        t0 = time.monotonic()
        try:
            fn(spark, sf_dir).collect()
            queries[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # keep the bench JSON parseable regardless
            queries[name] = -1.0
            out.setdefault("errors", {})[name] = f"{type(e).__name__}: {e}"

    out.update(
        metric=(
            "index-build throughput (docs/s, postings/s) + BM25 top-10 "
            "p50 latency; per-item seconds in queries"
        ),
        value=round(time.monotonic() - t_total0, 3),
        unit="sec",
        queries=queries,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
