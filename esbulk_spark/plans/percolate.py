"""Percolate: reverse search — match stored queries against documents.

ES's percolator indexes QUERIES and answers "which registered queries
match this document" (the alerting/routing primitive; the ES surface the
reference's indexed data is wired into once alert rules exist). The
Spark-first shape inverts the ES single-doc API into a set-at-a-time
join — the form a 100 TB pipeline actually wants: percolate EVERY
incoming document against the rule set in one pass.

Plan shape: queries are analyzed driver-side (rule sets are small —
10^2-10^6 rows, human-authored) into (query_id, term) pairs and
broadcast; documents explode to DISTINCT (doc_id, term) via the same
code-aware analyzer the index uses; one broadcast equi-join on term +
one (query_id, doc_id) hash-agg counting matched terms:

  match semantics  = ES `match` with operator=and (conjunction of all
                     analyzed terms; ES default operator=or is the
                     degenerate count >= 1 case, exposed via `mode`)
  shuffle volume   = matched (query_id, doc_id) pairs only — the
                     broadcast join emits nothing for non-matching terms

No per-row Python: analysis is the Catalyst tokenizer expression, the
join and agg are JVM hash ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esbulk_spark.functions.analyzer import analyze_query, tokens_col

__all__ = ["percolate"]


def percolate(
    spark: SparkSession,
    queries: list[tuple[str, str]],
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "and",
) -> DataFrame:
    """Match registered queries against every document.

    ``queries`` = [(query_id, query_string), ...]; returns
    (query_id, doc_id, n_matched) for each document matching a query —
    all analyzed terms present for ``mode="and"`` (ES operator=and),
    any term for ``mode="or"``. Queries whose analysis yields no terms
    (stopword-only) match nothing, mirroring ES.
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    qterms = [
        (qid, t, len(set(analyze_query(q))))
        for qid, q in queries
        for t in sorted(set(analyze_query(q)))
    ]
    if not qterms:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, n_matched long"
        )
    qdf = spark.createDataFrame(qterms, "query_id string, term string, n_terms int")
    dtoks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    matched = (
        dtoks.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.first("n_terms").alias("n_terms"),
        )
    )
    if mode == "and":
        matched = matched.filter(F.col("n_matched") == F.col("n_terms"))
    return matched.select("query_id", "doc_id", "n_matched")
