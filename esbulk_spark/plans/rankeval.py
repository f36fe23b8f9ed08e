"""ES `_rank_eval` API analog: ranking-quality metrics over a result
set and a table of relevance judgments.

ES's _rank_eval takes (query -> ranked hits) plus rated documents and
reports precision@k / recall@k / MRR / DCG / NDCG (the standard IR
metrics; Järvelin & Kekäläinen 2002 for [N]DCG). Here both sides are
DataFrames, so the evaluation is a rank window + one join + one
hash-agg per metric family — no driver loops, any number of queries in
one pass.

Scale shape: ranks come from one window partitioned by qid (results
are top-k per query, so partitions are k-sized — no skew); judgments
join on (qid, doc); the ideal-DCG ranking is a second k-sized window
over judgments. Everything aggregates map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    qid_col: str = "qid",
    doc_col: str = "doc_id",
    score_col: str = "score",
    grade_col: str = "grade",
    k: int = 10,
) -> DataFrame:
    """Per-query precision@k, recall@k, MRR, DCG@k and NDCG@k.

    `results` are ranked score-desc (doc-asc tie-break, the engine's
    ordering); `judgments` carry integer relevance grades (>0 means
    relevant; graded values feed DCG's 2^g - 1 gain). Docs without a
    judgment count grade 0, the ES behavior."""
    rank_w = Window.partitionBy(qid_col).orderBy(
        F.desc(score_col), F.asc(doc_col)
    )
    ranked = (
        results.select(qid_col, doc_col, score_col)
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .join(
            judgments.select(qid_col, doc_col, grade_col),
            [qid_col, doc_col],
            "left",
        )
        .withColumn("g", F.coalesce(F.col(grade_col), F.lit(0)))
    )
    rel = F.when(F.col("g") > 0, 1).otherwise(0)
    gain = (F.pow(F.lit(2.0), F.col("g")) - 1) / F.log2(F.col("rank") + 1)
    # ES precision@k divides by the RETRIEVED window size, not fixed k:
    # a query returning 3 hits, all relevant, is 1.0 (not 3/k)
    per_q = ranked.groupBy(qid_col).agg(
        (F.sum(rel) / F.count("*").cast("double")).alias("precision_at_k"),
        F.sum(F.when(F.col("g") > 0, rel).otherwise(0)).alias("__n_rel_ret"),
        F.coalesce(
            F.max(F.when(F.col("g") > 0, 1.0 / F.col("rank"))), F.lit(0.0)
        ).alias("mrr"),
        F.sum(gain).alias("dcg_at_k"),
    )

    # ideal DCG: the judgments' own best ordering, top k grades
    ideal_w = Window.partitionBy(qid_col).orderBy(
        F.desc(grade_col), F.asc(doc_col)
    )
    ideal = (
        judgments.filter(F.col(grade_col) > 0)
        .withColumn("rank", F.row_number().over(ideal_w))
        .filter(F.col("rank") <= k)
        .groupBy(qid_col)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(grade_col)) - 1)
                / F.log2(F.col("rank") + 1)
            ).alias("__idcg"),
            F.count("*").alias("__n_rel_topk"),
        )
    )
    n_rel = judgments.filter(F.col(grade_col) > 0).groupBy(qid_col).agg(
        F.count("*").alias("__n_rel")
    )
    return (
        per_q.join(ideal, [qid_col], "left")
        .join(n_rel, [qid_col], "left")
        .select(
            qid_col,
            "precision_at_k",
            F.when(
                F.coalesce(F.col("__n_rel"), F.lit(0)) > 0,
                F.col("__n_rel_ret") / F.col("__n_rel").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall_at_k"),
            "mrr",
            "dcg_at_k",
            F.when(
                F.coalesce(F.col("__idcg"), F.lit(0.0)) > 0,
                F.col("dcg_at_k") / F.col("__idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg_at_k"),
        )
    )
