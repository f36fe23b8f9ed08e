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

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

# (keys, doc_id) tables at or under this many rows broadcast onto the
# corpus for the join-back; above it, a shuffle hash join on the keys
# (same data volume the pre-r3 plan ranged-shuffled anyway)
_BROADCAST_IDS_MAX_ROWS = 2_000_000


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


def assign_doc_ids_pinned(
    df: DataFrame,
    sort_keys: Sequence[str],
    out_col: str = "doc_id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """assign_doc_ids_with_count + the internally persisted range-partitioned
    DataFrame, so the caller can ``unpersist()`` exactly that cache once the
    ids are materialized (instead of nuking the whole process cache)."""
    return _assign(df, sort_keys, out_col, num_partitions)


def assign_doc_ids_with_count(
    df: DataFrame,
    sort_keys: Sequence[str],
    out_col: str = "doc_id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """assign_doc_ids + the total row count, which the prefix-sum pass
    computes anyway — callers save one count() action."""
    out, acc, _ = _assign(df, sort_keys, out_col, num_partitions)
    return out, acc


def _assign(
    df: DataFrame,
    sort_keys: Sequence[str],
    out_col: str = "doc_id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Two-pass prefix-sum id assignment; returns (df_with_ids, count, pinned).

    Entirely JVM-side: ``monotonically_increasing_id`` after a range
    partition + within-partition sort is ``(pid << 33) + local_index``
    (documented contract), so dense ids are ``partition_offset +
    local_index`` with offsets from a one-row-per-partition count. No
    document content ever crosses into Python — routing multi-KB rows
    through Arrow just to number them measurably bloats the reused
    Python workers and slows every later Python stage.

    ONLY THE SORT KEYS ride through the range shuffle (r3): numbering
    needs the key total order, not the multi-KB content — projecting
    keys first shrinks the shuffle+persist ~30x on a 2 KB-doc corpus,
    and the ids join back by key (broadcast when the corpus is small
    enough; shuffle hash join otherwise — the same volume the old plan
    moved ONCE, so never worse). Ids are identical either way: offsets
    accumulate in partition order, which IS the key order for any range
    boundary placement."""
    keys = [F.col(k) for k in sort_keys]
    keys_only = df.select(*keys)
    if num_partitions:
        parted = keys_only.repartitionByRange(num_partitions, *keys)
    else:
        parted = keys_only.repartitionByRange(*keys)
    parted = parted.sortWithinPartitions(*keys)
    parted = parted.persist(StorageLevel.MEMORY_AND_DISK)

    # pass 1: per-partition counts AND per-partition distinct-key counts
    # in ONE job (driver-side result: one row per partition — metadata,
    # not data). The distinct counts are the uniqueness guard: the
    # keys-only join-back is only exactly-one-id-per-row when the sort
    # keys are a total order — with duplicate keys (two byte-identical
    # documents and the default sort_keys=(content,)) the equi-join
    # would fan out n_dup^2 rows with duplicated doc_ids, silent index
    # corruption. Range partitioning co-locates equal keys, so the SUM
    # of per-partition distincts IS the global distinct count — no
    # second pass, no exchange (grouping rides the existing partitions).
    counts = (
        parted.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.count_distinct(*keys).alias("__ndist"),
        )
        .collect()
    )
    by_pid = {r["__pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    # count_distinct skips rows with NULL keys, so a NULL-key corpus
    # shows n_distinct < acc even when unique — probe that rare case
    # separately before falling back
    n_distinct = sum(int(r["__ndist"]) for r in counts)
    if n_distinct != acc:
        # could still be unique if the gap is exactly the NULL-key rows
        # (count_distinct drops NULLs): probe those separately — cheap,
        # and only on the rare corpus that has NULL sort keys at all
        null_pred = None
        for k in keys:
            c = k.isNull()
            null_pred = c if null_pred is None else (null_pred | c)
        n_null_rows = parted.filter(null_pred).count()
        if n_null_rows == 0 or n_distinct + n_null_rows != acc or n_null_rows > 1:
            parted.unpersist()
            return _assign_full_rows(df, sort_keys, out_col, num_partitions)

    # pass 2 (pure expressions): offset[pid] + (mono - (pid << 33))
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __offset long",
    )
    with_mono = parted.withColumn(
        "__pid", F.spark_partition_id()
    ).withColumn("__mono", F.monotonically_increasing_id())
    key_ids = (
        with_mono.join(F.broadcast(offset_df), "__pid", "left")
        .withColumn(
            out_col,
            (
                F.coalesce(F.col("__offset"), F.lit(0))
                + (F.col("__mono") - (F.col("__pid").cast("long") * F.lit(1 << 33)))
            ).cast("long"),
        )
        .drop("__pid", "__mono", "__offset")
    )
    # join ids back onto the untouched full rows. NULL-SAFE equality:
    # a plain equi-join drops rows whose key is NULL, so an id'd corpus
    # would silently lose documents; <=> keeps them (NULLs sort first in
    # the range partitioning, so their ids are well-defined).
    renamed = key_ids
    for i, kname in enumerate(sort_keys):
        renamed = renamed.withColumnRenamed(kname, f"__k{i}")
    if acc <= _BROADCAST_IDS_MAX_ROWS:
        renamed = F.broadcast(renamed)
    cond = None
    for i, kname in enumerate(sort_keys):
        c = df[kname].eqNullSafe(renamed[f"__k{i}"])
        cond = c if cond is None else (cond & c)
    out = df.join(renamed, on=cond).drop(*[f"__k{i}" for i in range(len(sort_keys))])
    return out, acc, parted


def _assign_full_rows(
    df: DataFrame,
    sort_keys: Sequence[str],
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int, DataFrame]:
    """Duplicate-key fallback: range-shuffle the FULL rows (the pre-r3
    plan) and number them in place — no join-back, so duplicate or NULL
    keys cannot fan out or drop rows. Ids stay dense and unique;
    tie-breaking among byte-identical keys is arbitrary but ids follow
    the key total preorder, which is all the posting encoder needs."""
    keys = [F.col(k) for k in sort_keys]
    if num_partitions:
        parted = df.repartitionByRange(num_partitions, *keys)
    else:
        parted = df.repartitionByRange(*keys)
    parted = parted.sortWithinPartitions(*keys)
    parted = parted.persist(StorageLevel.MEMORY_AND_DISK)

    counts = (
        parted.groupBy(F.spark_partition_id().alias("__pid"))
        .count()
        .collect()
    )
    by_pid = {r["__pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __offset long",
    )
    out = (
        parted.withColumn("__pid", F.spark_partition_id())
        .withColumn("__mono", F.monotonically_increasing_id())
        .join(F.broadcast(offset_df), "__pid", "left")
        .withColumn(
            out_col,
            (
                F.coalesce(F.col("__offset"), F.lit(0))
                + (F.col("__mono") - (F.col("__pid").cast("long") * F.lit(1 << 33)))
            ).cast("long"),
        )
        .drop("__pid", "__mono", "__offset")
    )
    return out, acc, parted
