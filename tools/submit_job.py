"""spark-submit entry point (the north rule's deployment mode):

    cd /root/repo && zip -qr /tmp/esbulk_spark.zip esbulk_spark
    spark-submit --master local[8] --py-files /tmp/esbulk_spark.zip \
        tools/submit_job.py <corpus.parquet> <index_dir> "<query>"

The driver script imports esbulk_spark ONLY from the shipped zip (no
repo on sys.path), builds the index, searches, and prints one JSON
line — exactly the shape a cluster `spark-submit --py-files` run takes
at N or 4N executors (swap --master for the cluster manager URL).
Smoke-tested end-to-end by tests/test_submit.py.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    corpus_path, index_dir, query = sys.argv[1], sys.argv[2], sys.argv[3]
    # session comes from spark-submit's conf; --py-files ships the package
    from pyspark.sql import SparkSession

    from esbulk_spark.config import IndexConfig
    from esbulk_spark.plans.build import build_index
    from esbulk_spark.plans.reader import IndexReader

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    t0 = time.monotonic()
    stats = build_index(
        spark,
        docs,
        IndexConfig(index_dir=index_dir, n_buckets=8, n_shards=4),
        input_sig=corpus_path,
    )
    build_secs = time.monotonic() - t0
    reader = IndexReader(spark, index_dir)
    hits = reader.search_rows(query, k=10, round_to=6)
    print(
        json.dumps(
            {
                "n_docs": stats["n_docs"],
                "total_postings": stats["total_postings"],
                "build_secs": round(build_secs, 2),
                "docs_per_sec": round(stats["n_docs"] / build_secs, 1),
                "query": query,
                "hits": [{"doc_id": d, "score": s} for d, s in hits],
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
