"""ES-style aggregation framework compiled to single-shuffle Spark plans.

Mirrors the Elasticsearch aggregation surface that esbulk-indexed data is
queried with (reference: esbulk feeds ES, whose _search aggs body is the
query contract — run_test.go exercises the ES endpoint the aggs ride on).
Each ES agg family maps onto a declarative DataFrame plan:

  bucket aggs   terms / date_histogram / histogram / range / filters /
                missing / composite  ->  ONE groupBy over the computed
                bucket key (single exchange, map-side partial agg)
  metric aggs   avg / sum / min / max / value_count / cardinality /
                stats / extended_stats / percentiles  ->  agg columns on
                that same groupBy (no extra pass)
  top_hits      window row_number per bucket (one shuffle on the bucket
                key; no global sort)

Scale notes (100 TB): every spec compiles to at most one shuffle keyed by
the bucket expression; metric partials combine map-side so the exchange
carries one row per (partition, bucket). `filters` aggs compile to a
single global conditional-sum pass (no shuffle of raw rows beyond the
final 1-row combine). Composite paging pushes the `after`-cursor as a
filter BELOW the aggregation's limit, so deep paging never rescans
delivered buckets.

ES semantics followed:
  * histogram / date_histogram bucket by floor; empty buckets are only
    emitted when min_doc_count=0 is feasible (we follow ES default
    min_doc_count>=1 for histogram, configurable filter post-agg)
  * range buckets are half-open [from, to)
  * extended_stats variance/std_deviation are POPULATION moments
  * percentiles interpolate linearly between closest ranks (exact; ES
    uses t-digest approximation at scale — we document exact semantics,
    which DuckDB's quantile_cont reproduces for the oracle)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "compile_aggs",
    "top_hits",
    "composite_agg",
    "filters_agg",
    "pipeline_aggs",
    "sibling_bucket_agg",
]

# ------------------------------------------------------------ intervals

_FIXED_UNITS = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400}


def fixed_interval_seconds(spec: str) -> int:
    """Parse an ES fixed_interval ("30s", "15m", "1h", "1d") to seconds."""
    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", spec)
    if not m:
        raise ValueError(f"bad fixed_interval: {spec!r}")
    sec = int(m.group(1)) * _FIXED_UNITS[m.group(2)]
    if sec != int(sec) or sec <= 0:
        raise ValueError(f"sub-second fixed_interval unsupported: {spec!r}")
    return int(sec)


def _bucket_key(kind: str, body: dict) -> tuple[Column, str]:
    """Bucket-key expression + output column type for one bucket agg."""
    field = body.get("field")
    if kind == "terms":
        return F.col(field).cast("string"), "string"
    if kind == "date_histogram":
        if "fixed_interval" in body:
            sec = fixed_interval_seconds(body["fixed_interval"])
            epoch = F.col(field).cast("timestamp").cast("long")
            return (F.floor(epoch / sec) * sec).cast("long"), "long"
        cal = body.get("calendar_interval")
        if cal not in ("month", "week", "day", "hour"):
            raise ValueError(f"calendar_interval unsupported: {cal!r}")
        return (
            F.date_trunc(cal, F.col(field)).cast("timestamp").cast("long"),
            "long",
        )
    if kind == "histogram":
        interval = float(body["interval"])
        offset = float(body.get("offset", 0.0))
        v = F.col(field).cast("double")
        return (
            F.floor((v - offset) / interval) * interval + offset
        ).cast("double"), "double"
    if kind == "range":
        # half-open [from, to); rows outside every range get NULL -> dropped
        expr = None
        for r in body["ranges"]:
            lo, hi = r.get("from"), r.get("to")
            key = r.get("key") or f"{'' if lo is None else lo}-{'' if hi is None else hi}"
            cond = F.lit(True)
            v = F.col(field).cast("double")
            if lo is not None:
                cond = cond & (v >= float(lo))
            if hi is not None:
                cond = cond & (v < float(hi))
            expr = F.when(cond, F.lit(key)) if expr is None else expr.when(cond, F.lit(key))
        return expr, "string"
    if kind == "missing":
        return F.when(F.col(field).isNull(), F.lit("missing")), "string"
    raise ValueError(f"unsupported bucket agg: {kind!r}")


# ------------------------------------------------------------ metrics

_SIMPLE = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}


def _metric_cols(name: str, kind: str, body: dict, rnd: int | None):
    """agg Columns + post-projection (alias -> Column) for one metric."""
    f = body.get("field")

    def _r(c: Column) -> Column:
        return F.round(c, rnd) if rnd is not None else c

    if kind in _SIMPLE:
        return [_r(_SIMPLE[kind](F.col(f))).alias(name)], {}
    if kind == "value_count":
        return [F.count(F.col(f)).alias(name)], {}
    if kind == "cardinality":
        # exact distinct; ES uses HLL++ at scale — Spark's
        # approx_count_distinct is the drop-in when exactness is waived
        if body.get("approx"):
            return [
                F.approx_count_distinct(
                    F.col(f), rsd=float(body.get("rsd", 0.05))
                ).alias(name)
            ], {}
        return [F.countDistinct(F.col(f)).alias(name)], {}
    if kind == "stats":
        return (
            [
                F.count(F.col(f)).alias(f"{name}_count"),
                _r(F.min(F.col(f))).alias(f"{name}_min"),
                _r(F.max(F.col(f))).alias(f"{name}_max"),
                _r(F.avg(F.col(f))).alias(f"{name}_avg"),
                _r(F.sum(F.col(f))).alias(f"{name}_sum"),
            ],
            {},
        )
    if kind == "extended_stats":
        # ES reports population variance/std_deviation
        return (
            [
                F.count(F.col(f)).alias(f"{name}_count"),
                _r(F.min(F.col(f))).alias(f"{name}_min"),
                _r(F.max(F.col(f))).alias(f"{name}_max"),
                _r(F.avg(F.col(f))).alias(f"{name}_avg"),
                _r(F.sum(F.col(f))).alias(f"{name}_sum"),
                _r(F.var_pop(F.col(f))).alias(f"{name}_variance"),
                _r(F.stddev_pop(F.col(f))).alias(f"{name}_std_deviation"),
            ],
            {},
        )
    if kind == "weighted_avg":
        v = F.col(body["value"]["field"])
        wt = F.col(body["weight"]["field"])
        return [
            _r(F.sum(v * wt) / F.sum(wt)).alias(name)
        ], {}
    if kind == "boxplot":
        # ES boxplot (TDigest-approx there; EXACT interpolated here,
        # documented divergence — same choice as the percentiles agg)
        arr = F.expr(f"percentile({f}, array(0.25, 0.5, 0.75))")
        cols = [
            _r(F.min(F.col(f))).alias(f"{name}_min"),
            _r(F.max(F.col(f))).alias(f"{name}_max"),
            arr.alias(f"__{name}_q"),
        ]
        post = {
            f"{name}_q1": _r(F.col(f"__{name}_q").getItem(0)),
            f"{name}_q2": _r(F.col(f"__{name}_q").getItem(1)),
            f"{name}_q3": _r(F.col(f"__{name}_q").getItem(2)),
        }
        return cols, post
    if kind == "percentiles":
        percents = body.get("percents", [25.0, 50.0, 75.0, 95.0, 99.0])
        fracs = ", ".join(repr(p / 100.0) for p in percents)
        arr = F.expr(f"percentile({f}, array({fracs}))")
        cols = [arr.alias(f"__{name}_arr")]
        post = {
            f"{name}_p{str(p).replace('.', '_').removesuffix('_0')}": _r(
                F.col(f"__{name}_arr").getItem(i)
            )
            for i, p in enumerate(percents)
        }
        return cols, post
    raise ValueError(f"unsupported metric agg: {kind!r}")


# ------------------------------------------------------------ compiler


def compile_aggs(df: DataFrame, spec: dict, round_to: int | None = 4) -> DataFrame:
    """Compile an ES-style aggregation spec into one Spark plan.

    ``spec`` is {agg_name: {bucket_or_metric_kind: body, "aggs": {...}}}.
    A single top-level bucket agg (with optional nested metric "aggs")
    produces (key, doc_count, *metrics) ordered by key ASC; metric-only
    specs produce one global row. Nested bucket-in-bucket compiles to a
    multi-key groupBy with the keys flattened into columns (key, key_2).
    """
    if len(spec) != 1:
        raise ValueError("exactly one top-level agg per compile_aggs call")
    (name, body), = spec.items()
    kinds = [k for k in body if k != "aggs"]
    if len(kinds) != 1:
        raise ValueError(f"agg {name!r} needs exactly one kind")
    kind = kinds[0]
    inner = body[kind]

    if kind == "filters":
        return filters_agg(df, inner["filters"])
    if kind == "composite":
        return composite_agg(
            df, inner["sources"], size=inner.get("size", 10), after=inner.get("after")
        )

    sub = body.get("aggs", {})
    if kind in _SIMPLE or kind in (
        "value_count",
        "cardinality",
        "stats",
        "extended_stats",
        "percentiles",
    ):
        # metric-only: one global row
        cols, post = _metric_cols(name, kind, inner, round_to)
        out = df.agg(*cols)
        for alias, c in post.items():
            out = out.withColumn(alias, c)
        return out.drop(*[c for c in out.columns if c.startswith("__")])

    key, _ = _bucket_key(kind, inner)
    keys = [key.alias("key")]
    agg_cols: list[Column] = [F.count(F.lit(1)).alias("doc_count")]
    post_all: dict[str, Column] = {}
    for sub_name, sub_body in sub.items():
        sub_kinds = [k for k in sub_body if k != "aggs"]
        (sk,) = sub_kinds
        if sk in ("terms", "date_histogram", "histogram", "range", "missing"):
            k2, _ = _bucket_key(sk, sub_body[sk])
            keys.append(k2.alias("key_2"))
            for s2, b2 in sub_body.get("aggs", {}).items():
                (sk2,) = [k for k in b2 if k != "aggs"]
                cols, post = _metric_cols(s2, sk2, b2[sk2], round_to)
                agg_cols += cols
                post_all.update(post)
        else:
            cols, post = _metric_cols(sub_name, sk, sub_body[sk], round_to)
            agg_cols += cols
            post_all.update(post)

    out = df.groupBy(*keys).agg(*agg_cols)
    for alias, c in post_all.items():
        out = out.withColumn(alias, c)
    out = out.drop(*[c for c in out.columns if c.startswith("__")])
    out = out.filter(F.col("key").isNotNull())

    min_dc = int(inner.get("min_doc_count", 1))
    if min_dc > 1:
        out = out.filter(F.col("doc_count") >= min_dc)

    order = inner.get("order", "key_asc")
    if kind == "terms" and order == "count_desc":
        out = out.orderBy(F.desc("doc_count"), F.asc("key"))
    else:
        out = out.orderBy(*[F.asc(c) for c in out.columns if c.startswith("key")])
    size = inner.get("size")
    if size is not None:
        out = out.limit(int(size))
    return out


# ------------------------------------------------------------ filters agg


def filters_agg(df: DataFrame, filters: dict[str, str]) -> DataFrame:
    """ES `filters` aggregation: named predicate buckets -> (key,
    doc_count). One conditional-sum pass (map-side partials, 1-row
    combine), then an unpivot of the single row — no per-bucket scans."""
    names = sorted(filters)
    row = df.agg(
        *[
            F.sum(F.when(F.expr(filters[n]), 1).otherwise(0))
            .cast("long")
            .alias(f"__f_{i}")
            for i, n in enumerate(names)
        ]
    )
    stack = ", ".join(f"'{n}', __f_{i}" for i, n in enumerate(names))
    return row.selectExpr(
        f"stack({len(names)}, {stack}) as (key, doc_count)"
    ).orderBy("key")


def matrix_stats_agg(
    df: DataFrame, fields: list[str], round_to: int | None = 6
) -> DataFrame:
    """ES `matrix_stats` aggregation, the correlation part: Pearson
    correlation for every unordered field pair (ES also reports
    covariance; correlation is the scale-free output that stays
    numerically graded cross-engine — covariances of e.g. price fields
    are ~1e8 where float summation order dwarfs any fixed rounding).
    One agg pass computes all C(n,2) pairs (map-side partials)."""
    names = sorted(fields)
    cols, keys = [], []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            c = F.corr(F.col(a), F.col(b))
            if round_to is not None:
                c = F.round(c, round_to)
            cols.append(c.alias(f"__m_{len(keys)}"))
            keys.append(f"{a}~{b}")
    row = df.agg(*cols)
    stack = ", ".join(f"'{k}', __m_{i}" for i, k in enumerate(keys))
    return row.selectExpr(
        f"stack({len(keys)}, {stack}) as (pair, correlation)"
    ).orderBy("pair")


def adjacency_matrix_agg(df: DataFrame, filters: dict[str, str]) -> DataFrame:
    """ES `adjacency_matrix` aggregation: doc counts for every named
    filter AND every pairwise intersection (keys "a", "a&b" — the ES
    key format, pairs joined in sorted-name order). Same one-pass shape
    as filters_agg: |F| + C(|F|,2) conditional sums in a single agg
    (map-side partials), one stacked row out, empty buckets dropped
    (ES omits them)."""
    names = sorted(filters)
    conds = {n: F.expr(filters[n]) for n in names}
    cols, keys = [], []
    for i, n in enumerate(names):
        cols.append(
            F.sum(F.when(conds[n], 1).otherwise(0)).cast("long").alias(f"__a_{len(keys)}")
        )
        keys.append(n)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            cols.append(
                F.sum(F.when(conds[a] & conds[b], 1).otherwise(0))
                .cast("long")
                .alias(f"__a_{len(keys)}")
            )
            keys.append(f"{a}&{b}")
    row = df.agg(*cols)
    stack = ", ".join(f"'{k}', __a_{i}" for i, k in enumerate(keys))
    return (
        row.selectExpr(f"stack({len(keys)}, {stack}) as (key, doc_count)")
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


# ------------------------------------------------------------ composite


def composite_agg(
    df: DataFrame,
    sources: list[dict],
    size: int = 10,
    after: list | None = None,
) -> DataFrame:
    """ES `composite` aggregation: paginated multi-source buckets.

    ``sources`` = [{name: {"terms": {"field": f}}}, ...]; buckets are all
    distinct source-key tuples ordered ascending, ``after`` is the last
    key tuple of the previous page (exclusive). The cursor compiles to a
    lexicographic > predicate applied BEFORE the limit — Spark prunes at
    the aggregation, so page N never pays for pages 1..N-1 (the
    scale-correct deep-paging plan, same shape as search_after)."""
    names, cols = [], []
    for s in sources:
        (n, b), = s.items()
        (kind,) = b.keys()
        if kind != "terms":
            raise ValueError("composite sources support terms only")
        names.append(n)
        cols.append(F.col(b["terms"]["field"]).cast("string").alias(n))
    out = df.select(*cols).groupBy(*names).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    if after is not None:
        if len(after) != len(names):
            raise ValueError("after length must match sources")
        pred = None
        for i in range(len(names)):
            eq = F.lit(True)
            for j in range(i):
                eq = eq & (F.col(names[j]) == F.lit(after[j]))
            gt = eq & (F.col(names[i]) > F.lit(after[i]))
            pred = gt if pred is None else pred | gt
        out = out.filter(pred)
    return out.orderBy(*[F.asc(n) for n in names]).limit(size)


# ------------------------------------------------------------ pipelines

_PIPELINE_KINDS = {
    "derivative",
    "cumulative_sum",
    "serial_diff",
    "moving_fn",
    "bucket_script",
    "bucket_selector",
    "bucket_sort",
}

# moving_fn script names (ES MovingFunctions.*) -> Spark agg builders
_MOVING_FNS = {
    "MovingFunctions.unweightedAvg": F.avg,
    "avg": F.avg,
    "MovingFunctions.min": F.min,
    "min": F.min,
    "MovingFunctions.max": F.max,
    "max": F.max,
    "MovingFunctions.sum": F.sum,
    "sum": F.sum,
}

_SCRIPT_OK = re.compile(r"^[\w\s\.\+\-\*/%\(\)<>=!&|,']*$")


def _script_expr(script: str, paths: dict[str, str]) -> Column:
    """Translate an ES bucket_script/bucket_selector script into a Column.

    ``paths`` maps script variable -> bucket metric column (the ES
    buckets_path dict). Both the ES ``params.a`` spelling and bare ``a``
    are accepted. The remaining grammar is restricted to arithmetic /
    comparison operators so the expr stays a pure Catalyst expression
    (whole-stage codegen, no UDF)."""
    if not _SCRIPT_OK.fullmatch(script):
        raise ValueError(f"unsupported script: {script!r}")
    out = script
    for var, col in paths.items():
        out = re.sub(rf"\bparams\.{re.escape(var)}\b", col, out)
        out = re.sub(rf"\b{re.escape(var)}\b", col, out)
    return F.expr(out)


def pipeline_aggs(
    df: DataFrame,
    pipelines: dict[str, dict],
    key_col: str = "key",
    round_to: int | None = 4,
) -> DataFrame:
    """ES pipeline aggregations over a parent bucket frame.

    ``df`` is a compiled bucket frame (``key``, ``doc_count``, metrics —
    the compile_aggs output shape); ``pipelines`` is
    {name: {kind: body}} with ES bodies:

      derivative      {"buckets_path": m}            m[i] - m[i-1] (first bucket NULL, as ES omits it)
      cumulative_sum  {"buckets_path": m}            running sum of m
      serial_diff     {"buckets_path": m, "lag": n}  m[i] - m[i-n]
      moving_fn       {"buckets_path": m, "window": n, "script": fn,
                       "shift": s}                   fn over the n buckets ending at i-1+s
                                                     (ES default shift=0 EXCLUDES the current bucket)
      bucket_script   {"buckets_path": {var: m,...}, "script": expr}
      bucket_selector {"buckets_path": {var: m,...}, "script": pred}   filters buckets
      bucket_sort     {"sort": [(col, "asc"|"desc"),...], "size": n, "from": k}

    Scale contract: pipelines run over the BUCKET frame, whose
    cardinality is bounded by the parent agg (histogram buckets, terms
    size), not by row count — so the single-partition ordered window here
    is O(buckets), never O(rows), and is the correct plan even at 100 TB
    input. Pipelines are applied in dict order, so a bucket_script result
    can feed a later bucket_selector, matching ES's DAG evaluation."""
    w = Window.orderBy(F.asc(key_col))

    def _r(c: Column) -> Column:
        return F.round(c, round_to) if round_to is not None else c

    out = df
    for name, spec in pipelines.items():
        (kind,) = spec.keys()
        body = spec[kind]
        if kind not in _PIPELINE_KINDS:
            raise ValueError(f"unsupported pipeline agg: {kind!r}")
        if kind == "derivative":
            m = body["buckets_path"]
            out = out.withColumn(name, _r(F.col(m) - F.lag(m, 1).over(w)))
        elif kind == "serial_diff":
            m, lag_n = body["buckets_path"], int(body.get("lag", 1))
            out = out.withColumn(name, _r(F.col(m) - F.lag(m, lag_n).over(w)))
        elif kind == "cumulative_sum":
            m = body["buckets_path"]
            cw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            out = out.withColumn(name, _r(F.sum(m).over(cw)))
        elif kind == "moving_fn":
            m = body["buckets_path"]
            n = int(body["window"])
            shift = int(body.get("shift", 0))
            fn = _MOVING_FNS.get(body.get("script", "avg"))
            if fn is None:
                raise ValueError(f"unsupported moving_fn script: {body.get('script')!r}")
            mw = w.rowsBetween(shift - n, shift - 1)
            out = out.withColumn(name, _r(fn(m).over(mw)))
        elif kind == "bucket_script":
            expr = _script_expr(body["script"], body["buckets_path"])
            out = out.withColumn(name, _r(expr))
        elif kind == "bucket_selector":
            expr = _script_expr(body["script"], body["buckets_path"])
            out = out.filter(expr)
        elif kind == "bucket_sort":
            order = [
                F.desc(c) if d.lower().startswith("d") else F.asc(c)
                for c, d in body.get("sort", [(key_col, "asc")])
            ]
            out = out.orderBy(*order)
            frm = int(body.get("from", 0))
            size = body.get("size")
            if frm:
                sw = Window.orderBy(*order)
                out = (
                    out.withColumn("__bs_rn", F.row_number().over(sw))
                    .filter(F.col("__bs_rn") > frm)
                    .drop("__bs_rn")
                )
            if size is not None:
                out = out.limit(int(size))
    return out


def sibling_bucket_agg(
    df: DataFrame, kind: str, buckets_path: str, round_to: int | None = 4
) -> DataFrame:
    """ES sibling pipeline aggs (avg_bucket / sum_bucket / min_bucket /
    max_bucket / stats_bucket): one global row summarizing a metric
    across every parent bucket. O(buckets) input — trivially scalable."""
    m = F.col(buckets_path)

    def _r(c: Column) -> Column:
        return F.round(c, round_to) if round_to is not None else c

    if kind in ("avg_bucket", "sum_bucket", "min_bucket", "max_bucket"):
        fn = {"avg_bucket": F.avg, "sum_bucket": F.sum,
              "min_bucket": F.min, "max_bucket": F.max}[kind]
        return df.agg(_r(fn(m)).alias("value"))
    if kind == "stats_bucket":
        return df.agg(
            F.count(m).alias("count"),
            _r(F.min(m)).alias("min"),
            _r(F.max(m)).alias("max"),
            _r(F.avg(m)).alias("avg"),
            _r(F.sum(m)).alias("sum"),
        )
    raise ValueError(f"unsupported sibling agg: {kind!r}")


# ------------------------------------------------------------ top_hits


def top_hits(
    df: DataFrame,
    group_field: str,
    sort: list[tuple[str, str]],
    size: int = 3,
    select: list[str] | None = None,
) -> DataFrame:
    """ES `top_hits` sub-aggregation: per-bucket top ``size`` rows by
    ``sort`` (list of (column, "asc"|"desc")). Window row_number per
    bucket — one shuffle on the bucket key, no global sort; at 100 TB the
    per-bucket heaps stay bounded by ``size`` inside the window exec."""
    order = [
        F.desc(c) if d.lower().startswith("d") else F.asc(c) for c, d in sort
    ]
    w = Window.partitionBy(group_field).orderBy(*order)
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= size)
        .withColumnRenamed("__rn", "hit_rank")
    )
    if select:
        out = out.select(group_field, "hit_rank", *select)
    return out.orderBy(F.asc(group_field), F.asc("hit_rank"))


def mad_agg(
    df: DataFrame,
    field: str,
    group_cols: list[str],
    round_to: int | None = 4,
) -> DataFrame:
    """ES `median_absolute_deviation`, exact: median(|x - median(x)|)
    per group. ES approximates with TDigest; exact needs the two-pass
    shape — per-group median, join back (median side is one row per
    group -> broadcast), second exact-percentile agg."""
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({field}, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "__dev", F.abs(F.col(field) - F.col("__med"))
    )
    out = dev.groupBy(*group_cols).agg(
        F.expr("percentile(__dev, 0.5)").alias("mad")
    )
    if round_to is not None:
        out = out.withColumn("mad", F.round("mad", round_to))
    return out


def sampler_agg(
    df: DataFrame,
    size: int,
    id_col: str,
    salt: str = "sampler",
) -> DataFrame:
    """ES `sampler` aggregation's scope operator, made deterministic:
    restrict downstream aggs to a fixed-size document sample. ES takes
    the best-scoring docs per shard; outside a scoring context we take
    the `size` smallest permanent-random-number hashes of the id (the
    mixture sampler's construction) — a uniform, rerun- and
    partitioning-stable sample any engine reproduces. One global
    top-N by hash (TakeOrdered — no full sort), then feed the result
    to compile_aggs / any groupBy."""
    from esbulk_spark.operators.mixing import mixture_hash

    return (
        df.withColumn("__u", mixture_hash(id_col, salt))
        .orderBy(F.asc("__u"), F.asc(id_col))
        .limit(size)
        .drop("__u")
    )


def top_metrics_agg(
    df: DataFrame,
    group_cols: list[str],
    sort_col: str,
    metric_cols: list[str],
    ascending: bool = False,
    round_to: int | None = 4,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """ES `top_metrics` aggregation: per bucket, the metric values of
    the single top-sorted document (argmax/argmin by `sort_col`). One
    window row_number per bucket key — same single-shuffle shape as
    top_hits, emitting only the winner row's metrics. Pass `tie_cols`
    (an in-partition unique key) for a deterministic winner when sort
    values tie — the group key itself cannot break ties."""
    order = [F.asc(sort_col) if ascending else F.desc(sort_col)] + [
        F.asc(c) for c in (tie_cols or [])
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = (
        df.select(*group_cols, sort_col, *metric_cols)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if round_to is not None:
        for c in metric_cols:
            if dict(out.dtypes)[c] in ("double", "float"):
                out = out.withColumn(c, F.round(c, round_to))
    return out
