"""ES join-field analogs: `has_child` / `has_parent` queries.

ES models parent/child with a `join` field inside one index and
co-locates families by routing on the parent id; `has_child` returns
parents whose children match an inner query (score_mode
none/sum/max/min/avg over child scores), `has_parent` returns children
whose parent matches. The Spark-first re-expression is the join the ES
runtime is emulating: children aggregate to (parent_key, score) with a
hash-agg, then join the parents — ONE shuffle on the family key, which
is exactly ES's routing invariant. Both sides stay DataFrames, so any
predicate/score expression works as the inner query.

At scale the child-side agg reduces to one row per matching parent
BEFORE the join (map-side partial agg), so the join input is bounded by
the parent count, not the child count; a broadcast fires automatically
when the matched-parent set is small (AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCORE_MODES = ("none", "sum", "max", "min", "avg")


def has_child(
    parent_df: DataFrame,
    child_df: DataFrame,
    parent_key: str,
    child_key: str,
    child_pred: Column,
    child_score: Column | None = None,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """Parents with matching children. Adds `score` (0.0 for score_mode
    'none', ES behavior) and `n_matching_children`. min/max_children
    mirror the ES options (families outside the bounds drop)."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    sc = child_score if child_score is not None else F.lit(1.0)
    matched = (
        child_df.filter(child_pred)
        .select(F.col(child_key).alias(parent_key), sc.alias("__cs"))
        .groupBy(parent_key)
        .agg(
            F.count("*").alias("n_matching_children"),
            F.sum("__cs").alias("__sum"),
            F.max("__cs").alias("__max"),
            F.min("__cs").alias("__min"),
            F.avg("__cs").alias("__avg"),
        )
        .filter(F.col("n_matching_children") >= min_children)
    )
    if max_children is not None:
        matched = matched.filter(
            F.col("n_matching_children") <= max_children
        )
    score = {
        "none": F.lit(0.0),
        "sum": F.col("__sum"),
        "max": F.col("__max"),
        "min": F.col("__min"),
        "avg": F.col("__avg"),
    }[score_mode]
    return parent_df.join(matched, [parent_key]).select(
        *parent_df.columns,
        score.alias("score"),
        "n_matching_children",
    )


def has_parent(
    parent_df: DataFrame,
    child_df: DataFrame,
    parent_key: str,
    child_key: str,
    parent_pred: Column,
    parent_score: Column | None = None,
    score: bool = False,
) -> DataFrame:
    """Children whose parent matches. ES propagates the parent's score
    to every child when score=true, else 0.0."""
    ps = parent_score if parent_score is not None else F.lit(1.0)
    matched = parent_df.filter(parent_pred).select(
        F.col(parent_key).alias(child_key),
        (ps if score else F.lit(0.0)).alias("score"),
    )
    return child_df.join(matched, [child_key]).select(
        *child_df.columns, "score"
    )
