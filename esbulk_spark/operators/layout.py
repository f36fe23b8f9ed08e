"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB the cheapest query accelerator is the file layout: parquet
readers prune row groups whose min/max footer stats exclude the
predicate, but a sort by ONE column destroys locality on every other
column. Z-ordering (Morton order — bit-interleaving the columns'
rank-space positions; public technique popularized by databricks'
OPTIMIZE ZORDER and Amazon Redshift's interleaved sort keys) keeps
row-group min/max ranges narrow on ALL participating columns at once,
so selective predicates on any of them prune.

Implementation is Spark-first and rank-based: each column maps to its
approximate quantile bucket (2^bits buckets via approxQuantile — one
pass, driver gets 2^bits splits per column), the bucket ids
bit-interleave into one long, and a range-partitioned sort on that key
lays the data out. Rank-space (not value-space) interleaving makes the
curve robust to skew — a heavy-hitter value occupies many buckets of
one column without starving the others.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, splits: list[float], bits: int) -> Column:
    """Quantile-bucket id (0 .. 2^bits-1) for a column via a binary
    CASE cascade over the precomputed splits (pure Catalyst)."""
    n = 1 << bits
    expr = F.lit(n - 1)
    # splits has n-1 interior boundaries; value < splits[i] -> bucket i
    for i in range(len(splits) - 1, -1, -1):
        expr = F.when(F.col(col) < F.lit(splits[i]), F.lit(i)).otherwise(expr)
    return expr.cast("long")


def morton_interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave the low `bits` bits of each bucket id, round-robin
    (col0 gets the most significant position of each round)."""
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for c in bucket_cols:
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Attach a `__zkey` Morton key over `cols` (numeric). One
    approxQuantile pass computes each column's 2^bits rank splits."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    buckets = []
    for c in cols:
        splits = df.stat.approxQuantile(c, probs, 0.001)
        buckets.append(_bucket_expr(c, splits, bits))
    return df.withColumn("__zkey", morton_interleave(buckets, bits)), "__zkey"


def zorder_write(
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Write `df` Z-ordered by `cols`: range-repartition + in-partition
    sort on the Morton key (a total order across files, so every file
    AND every row group covers a compact curve segment), key dropped
    from the output. `n_files` controls target file count."""
    keyed, k = zorder_key(df, cols, bits)
    parts = n_files or keyed.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(parts, F.col(k))
        .sortWithinPartitions(k)
        .drop(k)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
