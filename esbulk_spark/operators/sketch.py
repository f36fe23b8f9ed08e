"""Deterministic HyperLogLog distinct-count sketches.

ES's `cardinality` aggregation is HLL++ (Heule et al. 2013); Spark's
`approx_count_distinct` is too — but neither is reproducible across
engines, so neither can be graded against a DuckDB oracle. This module
implements classic HyperLogLog (Flajolet et al. 2007, public) on the
repo's cross-engine md5 hash: every step is exact integer/`ln`
arithmetic that Spark and DuckDB compute bit-identically, so the
ESTIMATE itself is graded, not just the row count.

Why this matters at 100 TB: the register table IS a mergeable sketch —
`groupBy(j).max(rho)` is associative, so per-partition partial
aggregation (map-side combine) reduces each group to <= m rows no
matter the corpus width, sketches for different segments/days union +
re-max into a combined sketch without touching raw data, and the final
estimate reads m rows per group. Exact `count_distinct` by contrast
shuffles every distinct value.

Precision notes (why the estimate is deterministic):
- hash = md5_int (60-bit positive); register index j = h mod m, the
  remaining w = h div m is a 60-lg(m)-bit word; rho = leftmost-1
  position via length(ltrim(bin(w), '0')) — string ops, no float log.
- the harmonic-mean denominator sums 2^(L+1-rho) as BIGINT (exact;
  <= m * 2^(L+1) < 2^63), so no float-summation-order divergence.
- one double division + the alpha constant produce the raw estimate;
  the small-range linear-counting branch is m * ln(m / V0). The
  64-bit large-range correction is unnecessary at a 60-bit hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esbulk_spark.operators.dedup import md5_int


def _alpha(m: int) -> float:
    # Flajolet 2007 bias constants
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Register table (group_cols..., j, rho) with one row per non-empty
    register: the mergeable sketch. p register-index bits -> m = 2^p
    registers, standard error ~1.04/sqrt(m) (~3.2% at p=10)."""
    m = 1 << p
    width = 60 - p  # bits left in w after the index
    h = md5_int(F.col(value_col).cast("string"))
    # integer shift, NOT h/m: double division rounds above 2^53
    w = F.shiftright(h, p)
    # Spark's bin() has no leading zeros, so bitlen = length(bin(w))
    # except w = 0 (bin -> "0", length 1): all-zero word, rho = width+1
    rho = (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(w)))
        .alias("rho")
    )
    return (
        df.select(*group_cols, F.pmod(h, F.lit(m)).alias("j"), rho)
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches over the same group columns and re-max: the HLL
    merge. sketch(A) merge sketch(B) == sketch(A union B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("rho",)]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Cardinality estimate per group from a register table."""
    m = 1 << p
    width = 60 - p
    # exact integer term: 2^(width+1-rho), rho in [1, width+1]
    term = F.expr(f"cast(pow(2.0, {width + 1} - rho) as bigint)")
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(term).alias("sum_present"),
        F.count("*").alias("n_present"),
    )
    scale = float(1 << (width + 1))
    sum_total = (
        F.col("sum_present")
        + (F.lit(m) - F.col("n_present")) * F.lit(1 << (width + 1))
    ).cast("double")
    e_raw = F.lit(_alpha(m) * m * m * scale) / sum_total
    v0 = F.lit(m) - F.col("n_present")  # zero registers
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v0 > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v0.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, est.alias("hll_estimate"))


def hll_cardinality(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = 10
) -> DataFrame:
    """ES `cardinality` agg, deterministic: sketch then estimate."""
    return hll_estimate(
        hll_sketch(df, value_col, group_cols, p), group_cols, p
    )


# --------------------------------------------------- count-min sketch


def _cms_bucket(value: F.Column, i, w: int):
    """Row-i bucket for a value: md5 of 'i:value' (same family the
    MinHash/mixture ops use for engine-identical hashing)."""
    return F.pmod(
        md5_int(F.concat(i.cast("string"), F.lit(":"), value.cast("string"))),
        F.lit(w),
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    d: int = 4,
    w: int = 4096,
    count_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public):
    (group..., i, b, c) counters, one row per non-empty cell (<= d*w
    rows per group regardless of corpus width). Deterministic md5 row
    hashes -> a DuckDB oracle reproduces every counter; merge = union +
    sum (associative, so map-side combine and per-segment sketches
    compose exactly like the HLL registers above).

    Counters are built from per-distinct-value counts: the d row hashes
    run once per DISTINCT (group, value) instead of once per occurrence
    (cell c = sum of occurrence counts hashing there — identical values,
    ~vocabulary-fold fewer md5 evaluations on text streams). Pass
    ``count_col`` when ``df`` is already an aggregated (value, count)
    table (e.g. the exact counts a heavy-hitter query computes anyway)
    to skip the internal aggregation."""
    group_cols = group_cols or []
    if count_col is None:
        counts = (
            df.select(*group_cols, F.col(value_col).alias("__v"))
            .groupBy(*group_cols, "__v")
            .agg(F.count("*").alias("__c"))
        )
    else:
        counts = df.select(
            *group_cols,
            F.col(value_col).alias("__v"),
            F.col(count_col).alias("__c"),
        )
    return (
        counts.select(
            *group_cols,
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
            F.col("__v"),
            F.col("__c"),
        )
        .select(
            *group_cols,
            "i",
            _cms_bucket(F.col("__v"), F.col("i"), w).alias("b"),
            F.col("__c"),
        )
        .groupBy(*group_cols, "i", "b")
        .agg(F.sum("__c").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum counters cell-wise: sketch(A) + sketch(B) == sketch(A||B)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "c"]
    return out.groupBy(*keys).agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 4096,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point-frequency estimates for candidate values: min over the d
    row counters (one-sided error — never under-counts). The sketch is
    tiny (<= d*w rows per group), so it broadcasts to the candidate
    join.

    A sketch built with group columns MUST pass the same `group_cols`
    here: the estimate is then per (group, value), with absent cells
    counting 0 within each group. Probing a grouped sketch ungrouped
    would min() across all groups' counters and could return counts
    below the true per-group frequency, breaking the one-sided-error
    contract — that mismatch raises."""
    group_cols = list(group_cols or [])
    extra = [c for c in sketch.columns if c not in ("i", "b", "c")]
    if sorted(extra) != sorted(group_cols):
        raise ValueError(
            f"sketch group columns {extra} != group_cols {group_cols}; "
            "a grouped sketch must be probed with its group columns "
            "(or pre-merged with cms_merge after dropping them)"
        )
    cand = candidates.select(F.col(value_col).alias("__v")).distinct()
    probes = cand.select(
        "__v",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
    ).select("__v", "i", _cms_bucket(F.col("__v"), F.col("i"), w).alias("b"))
    if group_cols:
        # every (group, probe-cell) pair must exist so an absent cell
        # counts 0 within ITS group (a bare left join on (i,b) would
        # drop group-cell pairs another group happens to fill)
        groups = sketch.select(*group_cols).distinct()
        probes = probes.crossJoin(F.broadcast(groups))
        joined = probes.join(
            F.broadcast(sketch), [*group_cols, "i", "b"], "left"
        )
    else:
        joined = probes.join(F.broadcast(sketch), ["i", "b"], "left")
    return (
        joined.groupBy(*group_cols, "__v")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_count"))
        .withColumnRenamed("__v", value_col)
    )
