"""Deterministic dense doc-id assignment (SURVEY.md B2).

The reference lets Elasticsearch autogenerate ``_id`` unless ``-id`` is
given (/root/reference/cmd/esbulk/main.go:52, indexing.go:288-303). Our
index needs DENSE GLOBAL LONGS (posting lists delta-compress them), and
they must be deterministic for resumability and rank-identity.

Spark has no stable zipWithIndex for DataFrames, and
``row_number() OVER (ORDER BY ...)`` collapses to a single partition —
fine at test scale, fatal at 10^12 rows. The scale path here is the
classic two-pass prefix-sum:

  1. range-repartition + sort within partitions on the total-order keys,
     persist (so both passes see identical partitioning);
  2. count rows per partition (tiny: one row per partition), exclusive
     prefix-sum on the driver;
  3. mapInPandas adds partition_offset + local running index.

Cost: one range-shuffle of the doc table + one pass. No global sort
bottleneck, no single reducer.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel


def assign_doc_ids(
    df: DataFrame,
    sort_keys: Sequence[str],
    out_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based long ``out_col`` following the total order of
    ``sort_keys``. Deterministic across runs and parallelism levels
    (assuming ``sort_keys`` is a total order, i.e. no duplicate keys)."""
    return assign_doc_ids_with_count(df, sort_keys, out_col, num_partitions)[0]


def assign_doc_ids_with_count(
    df: DataFrame,
    sort_keys: Sequence[str],
    out_col: str = "doc_id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """assign_doc_ids + the total row count, which the prefix-sum pass
    computes anyway — callers save one count() action."""
    import pandas as pd

    keys = [F.col(k) for k in sort_keys]
    if num_partitions:
        parted = df.repartitionByRange(num_partitions, *keys)
    else:
        parted = df.repartitionByRange(*keys)
    parted = parted.sortWithinPartitions(*keys)
    parted = parted.persist(StorageLevel.MEMORY_AND_DISK)

    # pass 1: per-partition counts -> exclusive prefix sums (driver-side,
    # one row per partition — this is metadata, not data)
    counts = (
        parted.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    by_pid = {r["__pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    # pass 2: local running index + partition offset
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(parted.schema.fields) + [StructField(out_col, LongType(), False)]
    )

    def add_ids(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in pdfs:
            pdf = pdf.copy()
            pdf[out_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(add_ids, out_schema), acc
