"""Per-entry profiling harness for optimization round 6 (guide §1).

Times individual driver-contract entries with the SAME methodology as
bench.py (fn(spark, sf_dir).collect()), labelled per entry
(setJobDescription), N repeats, plus an optional .explain("formatted")
dump per entry.  bench.py itself is FROZEN for measurement; this file
exists so optimization work can isolate and re-measure single entries
without paying the full build section.

Usage:
  python tools/bench_entries.py [entry ...] \
      [--sf-dir DIR] [--repeat N] [--explain-dir DIR] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    "dictionary_top100", "bm25_topk_wand", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "simhash_fingerprint", "embedding_cosine_topk",
    "agg_lineitem_pricing", "events_hourly_window", "optype_index_lww",
    "ann_pq_adc_topk", "hybrid_rrf_topk", "training_pipeline_e2e",
    "segment_set_search", "lm_perplexity", "dsir_importance_weights",
    "cms_heavy_hitters", "agg_cardinality_hll", "phrase_suggest_dym",
    "geo_distance_users", "dedup_incremental_lsh", "rank_eval_metrics",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()
    entries = args.entries or DEFAULT_ENTRIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from esbulk_spark.session import get_spark

    spark = get_spark(app_name="bench-entries", cpus=cpus,
                      shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from esbulk_spark.entry_queries import QUERIES

    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in entries:
        fn, _ = QUERIES[name]
        times = []
        jobs0 = None
        for r in range(args.repeat):
            sc.setJobDescription(f"{name} run{r}")
            t0 = time.monotonic()
            fn(spark, args.sf_dir).collect()
            times.append(round(time.monotonic() - t0, 3))
        sc.setJobDescription(None)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            try:
                plan = fn(spark, args.sf_dir)._sc  # noqa
            except Exception:
                plan = None
            try:
                txt = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                    f.write(txt)
            except Exception as e:
                print(f"explain failed for {name}: {e}", file=sys.stderr)
        out[name] = {"times": times, "min": min(times)}
        print(f"{name}: {times}", flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
