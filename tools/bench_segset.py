"""Warm-search latency vs attached-segment count (BENCH.md evidence).

The SegmentSetReader adds one bucket/term-pruned union branch per
segment; this measures that fan cost directly — build one main index,
attach N delta segments (append_docs merge=False), time warm searches
at each N. The curve is the compaction-cadence dial: attach until the
serving fan costs more than the amortized fast merge.

Usage: python tools/bench_segset.py [out_json]
Env: BENCH_SEGSET_MAIN (200000), BENCH_SEGSET_DELTA (5000),
     BENCH_SEGSET_STEPS (8), SPARK_GRAFT_CPUS (32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esbulk_spark.config import IndexConfig
from esbulk_spark.corpus import synth_corpus
from esbulk_spark.plans import admin
from esbulk_spark.plans.build import build_index
from esbulk_spark.session import get_spark

QUERIES = ["flushBuffer retry score", "getUserName", "return getValue0"]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench/segset_fan_r04.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_main = int(os.environ.get("BENCH_SEGSET_MAIN", "200000"))
    n_delta = int(os.environ.get("BENCH_SEGSET_DELTA", "5000"))
    steps = int(os.environ.get("BENCH_SEGSET_STEPS", "8"))
    spark = get_spark(cpus=cpus, shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    tmpdir = os.environ.get("BENCH_TMPDIR", "/tmp")
    main_dir = f"{tmpdir}/bench_append_main_{n_main}"
    if not os.path.exists(os.path.join(main_dir, "_SUCCESS")):
        synth_corpus(spark, n_main, seed=42).write.mode("overwrite").parquet(main_dir)
    idx = f"{tmpdir}/bench_segset_idx"
    shutil.rmtree(idx, ignore_errors=True)
    build_index(
        spark, spark.read.parquet(main_dir),
        IndexConfig(index_dir=idx, n_buckets=32, n_shards=4, overwrite=True),
        input_sig=f"bench-segset-main:{n_main}",
    )

    def warm(r) -> float:
        ts = []
        for q in QUERIES:
            t0 = time.monotonic()
            r.search(q, k=10).collect()
            ts.append(time.monotonic() - t0)
        # warm pass: repeat and keep the per-query minimum sum
        ts2 = []
        for q in QUERIES:
            t0 = time.monotonic()
            r.search(q, k=10).collect()
            ts2.append(time.monotonic() - t0)
        return round(sum(min(a, b) for a, b in zip(ts, ts2)) / len(QUERIES), 3)

    res = {"cpus": cpus, "n_main": n_main, "n_delta": n_delta,
           "warm_search_by_segments": {}}
    res["warm_search_by_segments"]["0"] = warm(admin.open_reader(spark, idx))
    for step in range(1, steps + 1):
        delta = synth_corpus(spark, n_delta, seed=1000 + step)
        admin.append_docs(spark, idx, delta, merge=False)
        if step in (1, 2, 4, 8, steps):
            res["warm_search_by_segments"][str(step)] = warm(
                admin.open_reader(spark, idx)
            )
    t0 = time.monotonic()
    admin.compact_attached(spark, idx)
    res["compact_sec"] = round(time.monotonic() - t0, 3)
    res["warm_search_after_compact"] = warm(admin.open_reader(spark, idx))
    shutil.rmtree(idx, ignore_errors=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
