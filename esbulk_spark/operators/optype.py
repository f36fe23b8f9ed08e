"""Op-type MERGE semantics (SURVEY.md B12).

The reference passes ``-optype`` through to Elasticsearch bulk actions
(/root/reference/indexing.go:279-307; semantics documented at
cmd/esbulk/main.go:41 and README.md:67-70):

  index  — replace: last write wins
  create — insert-only: existing ids are never overwritten
  update — upsert-merge: ``{"doc": ..., "doc_as_upsert": true}``

Re-expressed as DataFrame MERGE primitives (Iceberg MERGE INTO would be
the single-statement equivalent when a catalog is configured; these
compositions produce identical results on plain parquet tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def optype_index(
    existing: DataFrame,
    incoming: DataFrame,
    id_cols: Sequence[str],
    seq_col: str,
) -> DataFrame:
    """``index``: replace — last write (highest seq_col) wins per id.

    Deterministic: ties on seq_col break toward the incoming wave, then
    arbitrary-but-stable ordering columns should be included in seq_col."""
    unioned = existing.withColumn("__wave", F.lit(0)).unionByName(
        incoming.withColumn("__wave", F.lit(1))
    )
    w = Window.partitionBy(*id_cols).orderBy(
        F.desc(seq_col), F.desc("__wave")
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__wave")
    )


def optype_create(
    existing: DataFrame,
    incoming: DataFrame,
    id_cols: Sequence[str],
) -> DataFrame:
    """``create``: insert-only — incoming rows whose id already exists
    are dropped (left-anti join), then appended."""
    new_rows = incoming.join(
        existing.select(*id_cols).distinct(), list(id_cols), "left_anti"
    )
    return existing.unionByName(new_rows)


def optype_update(
    existing: DataFrame,
    incoming: DataFrame,
    id_cols: Sequence[str],
) -> DataFrame:
    """``update`` with doc_as_upsert: per-field merge — incoming non-null
    fields overwrite, missing ids are inserted (full outer + coalesce)."""
    ex = existing.select(
        *id_cols,
        *[F.col(c).alias(f"__ex_{c}") for c in existing.columns if c not in id_cols],
    )
    inc = incoming.select(
        *id_cols,
        *[F.col(c).alias(f"__in_{c}") for c in incoming.columns if c not in id_cols],
    )
    joined = ex.join(inc, list(id_cols), "full_outer")
    all_fields = [c for c in existing.columns if c not in id_cols]
    for c in incoming.columns:
        if c not in id_cols and c not in all_fields:
            all_fields.append(c)
    cols = [F.col(c) for c in id_cols]
    for c in all_fields:
        has_in = f"__in_{c}" in inc.columns
        has_ex = f"__ex_{c}" in ex.columns
        if has_in and has_ex:
            cols.append(F.coalesce(F.col(f"__in_{c}"), F.col(f"__ex_{c}")).alias(c))
        elif has_in:
            cols.append(F.col(f"__in_{c}").alias(c))
        else:
            cols.append(F.col(f"__ex_{c}").alias(c))
    return joined.select(*cols)
