"""Measure the two append modes' cost split (BENCH.md evidence).

append_docs(merge=True)  = delta build + INDEX-SIZED fast merge + swap
append_docs(merge=False) = delta build only (segment attached)

At a fixed delta size the gap between the two IS the fast-merge cost,
which grows with the index while the attach cost stays flat — the
Lucene ingest-slope argument made measurable. Also times a warm search
through the SegmentSetReader vs the merged index (the serving price of
deferred compaction).

Same corpus recipe as bench.py's headline (synth_corpus, ~2 KB docs):
MAIN_DOCS-doc main index, DELTA_DOCS-doc append batch, modes alternated
across rounds so host drift hits both equally.

Usage: python tools/bench_append.py [out_json]
Env: BENCH_APPEND_MAIN (200000), BENCH_APPEND_DELTA (5000),
     SPARK_GRAFT_CPUS (32), BENCH_APPEND_ROUNDS (3)
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


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench/append_attach_r04.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_main = int(os.environ.get("BENCH_APPEND_MAIN", "200000"))
    n_delta = int(os.environ.get("BENCH_APPEND_DELTA", "5000"))
    rounds = int(os.environ.get("BENCH_APPEND_ROUNDS", "3"))
    spark = get_spark(cpus=cpus, shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # materialize both corpora once (materialization is not timed, as in
    # bench.py: the reference reads an existing file)
    tmpdir = os.environ.get("BENCH_TMPDIR", "/tmp")
    main_dir = f"{tmpdir}/bench_append_main_{n_main}"
    delta_dir = f"{tmpdir}/bench_append_delta_{n_delta}"
    if not os.path.exists(os.path.join(main_dir, "_SUCCESS")):
        synth_corpus(spark, n_main, seed=42).write.mode("overwrite").parquet(main_dir)
    if not os.path.exists(os.path.join(delta_dir, "_SUCCESS")):
        synth_corpus(spark, n_delta, seed=777).write.mode("overwrite").parquet(delta_dir)
    main_docs = spark.read.parquet(main_dir)
    delta_docs = spark.read.parquet(delta_dir)

    idx = f"{tmpdir}/bench_append_idx"
    res: dict = {
        "cpus": cpus, "n_main": n_main, "n_delta": n_delta,
        "build_main_sec": [],
        "merge_true_sec": [], "merge_false_sec": [],
        "search_warm_merged_sec": None, "search_warm_segset_sec": None,
    }

    def fresh_main() -> None:
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.monotonic()
        build_index(
            spark, main_docs,
            IndexConfig(index_dir=idx, n_buckets=32, n_shards=4,
                        overwrite=True),
            input_sig=f"bench-append-main:{n_main}",
        )
        res["build_main_sec"].append(round(time.monotonic() - t0, 3))

    def warm_search(r) -> float:
        ts = []
        for _i in range(3):
            t0 = time.monotonic()
            r.search("flushBuffer retry score", k=10).collect()
            ts.append(time.monotonic() - t0)
        return round(min(ts), 3)

    for _ in range(rounds):
        fresh_main()
        t0 = time.monotonic()
        admin.append_docs(spark, idx, delta_docs, merge=False)
        res["merge_false_sec"].append(round(time.monotonic() - t0, 3))
        res["search_warm_segset_sec"] = warm_search(admin.open_reader(spark, idx))

        fresh_main()
        t0 = time.monotonic()
        admin.append_docs(spark, idx, delta_docs, merge=True)
        res["merge_true_sec"].append(round(time.monotonic() - t0, 3))
        res["search_warm_merged_sec"] = warm_search(admin.open_reader(spark, idx))

    res["merge_false_best"] = min(res["merge_false_sec"])
    res["merge_true_best"] = min(res["merge_true_sec"])
    res["fast_merge_overhead_sec"] = round(
        res["merge_true_best"] - res["merge_false_best"], 3
    )
    shutil.rmtree(idx, ignore_errors=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
