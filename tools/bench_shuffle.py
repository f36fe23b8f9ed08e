"""Shuffle-volume evidence for the segmented-build crossover claim
(VERDICT r3 item 10).

BENCH.md argues the segmented build (cfg.segmented=N) loses wall time
at 200k docs (N extra waves of stage scheduling) but wins at scale
because each wave's token shuffle covers 1/N of the corpus — bounded
working set instead of one corpus-sized exchange. This tool measures
the actual exchange bytes (per-stage shuffle write, from the Spark UI
REST API — public monitoring surface) for single-pass vs segmented
builds at two corpus sizes, so the claim carries a measured curve:

    python tools/bench_shuffle.py [n_docs ...]     # default 50000 200000

Prints one JSON line per (n_docs, variant): wall seconds, total shuffle
write bytes, and the MAX bytes of any single exchange — the scale-
limiting number (one giant exchange is what kills a 10^12-doc build,
not the sum of several bounded ones).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def stage_shuffle_bytes(spark) -> dict[tuple[int, int], int]:
    """{(stageId, attemptId): shuffle write bytes} for completed stages
    (exchange output sizes); keyed so before/after deltas are exact
    regardless of the REST endpoint's ordering."""
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"applications/{app}/stages?status=complete")
    return {
        (int(s["stageId"]), int(s.get("attemptId", 0))): int(
            s.get("shuffleWriteBytes", 0)
        )
        for s in stages
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]

    from esbulk_spark.config import IndexConfig
    from esbulk_spark.corpus import synth_corpus
    from esbulk_spark.plans.build import build_index
    from esbulk_spark.session import get_spark

    spark = get_spark(
        app_name="esbulk-shuffle-bench",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (JIT) so the first measured build isn't compile-bound
    shutil.rmtree("/tmp/shufbench_warm", ignore_errors=True)
    build_index(
        spark, synth_corpus(spark, 3000, seed=7),
        IndexConfig(index_dir="/tmp/shufbench_warm", n_buckets=8, n_shards=2),
        input_sig="warm",
    )

    results = []
    for n_docs in sizes:
        corpus_dir = f"/tmp/shufbench_corpus_{n_docs}"
        import os

        if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
            synth_corpus(spark, n_docs, seed=42).write.mode("overwrite").parquet(
                corpus_dir
            )
        corpus = spark.read.parquet(corpus_dir)
        for variant, seg in (("single_pass", None), ("segmented4", 4)):
            d = f"/tmp/shufbench_idx_{n_docs}_{variant}"
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(d + ".segments", ignore_errors=True)
            before = stage_shuffle_bytes(spark)
            t0 = time.monotonic()
            build_index(
                spark, corpus,
                IndexConfig(
                    index_dir=d, n_buckets=32, n_shards=32,
                    chunk_cap=1 << 17, segmented=seg,
                ),
                input_sig=f"sb-{n_docs}-{variant}",
            )
            secs = round(time.monotonic() - t0, 2)
            after = stage_shuffle_bytes(spark)
            new = [v for k, v in after.items() if k not in before]
            rec = {
                "n_docs": n_docs,
                "variant": variant,
                "wall_sec": secs,
                "total_shuffle_mb": round(sum(new) / 1e6, 1),
                "max_exchange_mb": round(max(new, default=0) / 1e6, 1),
                "n_exchanges": sum(1 for b in new if b > 0),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"all": results}))
    spark.stop()


if __name__ == "__main__":
    main()
