"""Driver-gate cost-model experiment (r5 VERDICT item 9, guide §1).

At 2M docs the bench REF_QUERIES' term-df sums exceed the fixed
driver_score_max = 2M postings, so every mid-frequency query pays the
distributed per-shard plan (~0.5-0.9 s at sf1) even though the pruned
blobs it would collect are only tens of MB. This tool builds (or
reuses) an N-doc bench-shaped index and sweeps the gate, measuring
warm per-query latency on the SERVING path (search_rows) per gate
value, so the gate default is set from measurement instead of a guess.

    python tools/bench_serving_gate.py [n_docs] [gate_millions ...]

Emits one JSON object: per-gate p50/mean + per-query seconds, plus
each query's sum-of-dfs so the gate crossover is readable.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import REF_QUERIES  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    gates = [int(float(g) * 1e6) for g in sys.argv[2:]] or [
        2_000_000, 4_000_000, 8_000_000, 16_000_000, 1 << 62
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from esbulk_spark.config import IndexConfig
    from esbulk_spark.corpus import synth_corpus
    from esbulk_spark.functions.analyzer import analyze_query
    from esbulk_spark.plans.build import build_index
    from esbulk_spark.plans.reader import IndexReader
    from esbulk_spark.session import get_spark

    spark = get_spark(app_name="serving-gate", cpus=cpus,
                      shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    tmpdir = os.environ.get("BENCH_TMPDIR", "/tmp")
    corpus_dir = f"{tmpdir}/esbulk_bench_corpus2k_{n_docs}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_corpus(spark, n_docs, seed=42).write.mode("overwrite").parquet(corpus_dir)
    idx_dir = f"{tmpdir}/esbulk_gate_index_{cpus}_{n_docs}"
    if not os.path.exists(os.path.join(idx_dir, "stats.json")):
        shutil.rmtree(idx_dir, ignore_errors=True)
        build_index(
            spark, spark.read.parquet(corpus_dir),
            IndexConfig(index_dir=idx_dir, n_buckets=32, n_shards=32,
                        chunk_cap=1 << 17),
            input_sig=f"gate{n_docs}",
        )

    reader = IndexReader(spark, idx_dir)
    out: dict = {"n_docs": n_docs, "cpus": cpus, "gates": {}}
    with reader.interactive():
        dfsums = {}
        for i, q in enumerate(REF_QUERIES):
            dfs = reader._dfs_cached(analyze_query(q))
            dfsums[f"q{i:02d}"] = int(sum(dfs.values()))
        out["df_sums"] = dfsums
        reader.search_rows(REF_QUERIES[0], k=10)  # warm JIT/plan paths
        for gate in gates:
            reader.driver_score_max = gate
            spark.sparkContext.setJobDescription(f"gate={gate}")
            # warm pass (first pass per gate pays codegen for new plans)
            for q in REF_QUERIES:
                reader.search_rows(q, k=10, prune=True)
            lat: dict[str, float] = {}
            for i, q in enumerate(REF_QUERIES):
                t0 = time.monotonic()
                reader.search_rows(q, k=10, prune=True)
                lat[f"q{i:02d}"] = round(time.monotonic() - t0, 3)
            vals = list(lat.values())
            out["gates"][str(gate)] = {
                "p50": round(statistics.median(vals), 3),
                "mean": round(statistics.mean(vals), 3),
                "per_query": lat,
                "n_driver_path": sum(
                    1 for k, s in dfsums.items() if s <= gate
                ),
            }
            print(f"gate={gate}: p50={out['gates'][str(gate)]['p50']}"
                  f" mean={out['gates'][str(gate)]['mean']}"
                  f" driver-path={out['gates'][str(gate)]['n_driver_path']}/20",
                  flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
