"""Measure the two append modes' cost split (BENCH.md evidence).

append_docs(merge=True)  = delta build + INDEX-SIZED fast merge + swap
append_docs(merge=False) = delta build only (segment attached)

At a fixed delta size the gap between the two IS the fast-merge cost,
which grows with the index while the attach cost stays flat — the
Lucene ingest-slope argument made measurable. Also times a warm search
through the SegmentSetReader vs the merged index (the serving price of
deferred compaction).

Usage: python tools/bench_append.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esbulk_spark.config import IndexConfig
from esbulk_spark.plans import admin
from esbulk_spark.plans.build import build_index
from esbulk_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "bench/append_attach_r04.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_total = docs.count()
    # last ~2.5% of ids is the delta batch (fixed, deterministic)
    cut = int(n_total * 0.975)
    main_docs = docs.filter(F.col("doc_id") < cut)
    delta_docs = docs.filter(F.col("doc_id") >= cut)
    n_delta = delta_docs.count()

    idx = "/tmp/bench_append_idx"
    res: dict = {
        "sf_dir": sf_dir, "cpus": cpus,
        "n_main": cut, "n_delta": n_delta,
        "merge_true_sec": [], "merge_false_sec": [],
        "search_warm_merged_sec": None, "search_warm_segset_sec": None,
    }

    def fresh_main() -> None:
        shutil.rmtree(idx, ignore_errors=True)
        build_index(
            spark, main_docs,
            IndexConfig(index_dir=idx, id_col="doc_id", text_col="text",
                        n_buckets=16, n_shards=4, chunk_cap=1 << 15,
                        overwrite=True),
            input_sig=f"bench-append-main:{cut}",
        )

    # alternate modes across rounds so host drift hits both equally
    for _ in range(3):
        fresh_main()
        t0 = time.monotonic()
        admin.append_docs(spark, idx, delta_docs, keep_ids=True, merge=False)
        res["merge_false_sec"].append(round(time.monotonic() - t0, 3))
        # serve a warm search over the unmerged set (3rd rep of 3)
        r = admin.open_reader(spark, idx)
        ts = []
        for _i in range(3):
            t0 = time.monotonic()
            r.search("merge sort join", k=10).collect()
            ts.append(time.monotonic() - t0)
        res["search_warm_segset_sec"] = round(min(ts), 3)

        fresh_main()
        t0 = time.monotonic()
        admin.append_docs(spark, idx, delta_docs, keep_ids=True, merge=True)
        res["merge_true_sec"].append(round(time.monotonic() - t0, 3))
        r = admin.open_reader(spark, idx)
        ts = []
        for _i in range(3):
            t0 = time.monotonic()
            r.search("merge sort join", k=10).collect()
            ts.append(time.monotonic() - t0)
        res["search_warm_merged_sec"] = round(min(ts), 3)

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
