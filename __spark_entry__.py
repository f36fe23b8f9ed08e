"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: BM25 top-10 via the real inverted index with
                block-max pruning, over sf0.001 documents.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible entry.
Implementation lives in esbulk_spark/entry_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from esbulk_spark.entry_queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["bm25_topk_wand"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    # a callable oracle builds its SQL lazily (e.g. ann_ivf_topk inlines
    # data-derived centroid literals computed at call time)
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_fn, sql) in QUERIES.items()
        if sql is not None
    }
