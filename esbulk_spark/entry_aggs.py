"""Graded driver-contract entries for the ES aggregation framework
(esbulk_spark/plans/aggs.py) — each Spark plan paired with a DuckDB
oracle over the same parquet tables.

ES reference behavior modeled: the _search aggregations body served by
the cluster esbulk feeds (date_histogram / histogram / range / filters /
composite / terms+sub-metrics / stats / extended_stats / percentiles /
cardinality / top_hits). Reference parity point: esbulk verifies ingest
via the same ES endpoints these aggs ride on (run_test.go hits _search
and _count after bulk indexing).

Rounding conventions match entry_queries.py: computed floats rounded to
a fixed dp on BOTH sides; every bucket ordering is total (key-asc or
count-desc with key tie-break)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esbulk_spark.plans import aggs as A


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ------------------------------------------------- date_histogram (1d)


def q_agg_date_histogram(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "by_day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {"avg_value": {"avg": {"field": "value"}}},
            }
        },
    )


SQL_AGG_DATE_HISTOGRAM = """
SELECT (floor(epoch(ts) / 86400))::BIGINT * 86400 AS key,
       count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------- histogram (numeric)


def q_agg_histogram_price(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "orders"),
        {"price_hist": {"histogram": {"field": "o_totalprice", "interval": 25000}}},
    )


SQL_AGG_HISTOGRAM_PRICE = """
SELECT floor(o_totalprice / 25000) * 25000 AS key, count(*) AS doc_count
FROM orders GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------- range buckets


def q_agg_range_quantity(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "lineitem"),
        {
            "qty_ranges": {
                "range": {
                    "field": "l_quantity",
                    "ranges": [
                        {"to": 10, "key": "low"},
                        {"from": 10, "to": 25, "key": "mid"},
                        {"from": 25, "key": "high"},
                    ],
                },
                "aggs": {"avg_price": {"avg": {"field": "l_extendedprice"}}},
            }
        },
    )


SQL_AGG_RANGE_QUANTITY = """
SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity >= 10 AND l_quantity < 25 THEN 'mid'
            ELSE 'high' END AS key,
       count(*) AS doc_count,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem GROUP BY 1 ORDER BY key
"""


# ------------------------------------------------- extended_stats


def q_agg_extended_stats(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "lineitem"),
        {"qty": {"extended_stats": {"field": "l_quantity"}}},
    )


SQL_AGG_EXTENDED_STATS = """
SELECT count(l_quantity) AS qty_count,
       round(min(l_quantity), 4) AS qty_min,
       round(max(l_quantity), 4) AS qty_max,
       round(avg(l_quantity), 4) AS qty_avg,
       round(sum(l_quantity), 4) AS qty_sum,
       round(var_pop(l_quantity), 4) AS qty_variance,
       round(stddev_pop(l_quantity), 4) AS qty_std_deviation
FROM lineitem
"""


# ------------------------------------------------- percentiles (exact)


def q_agg_percentiles(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "orders"),
        {
            "price": {
                "percentiles": {
                    "field": "o_totalprice",
                    "percents": [25.0, 50.0, 75.0, 99.0],
                }
            }
        },
        round_to=2,
    )


SQL_AGG_PERCENTILES = """
SELECT round(quantile_cont(o_totalprice, 0.25), 2) AS price_p25,
       round(quantile_cont(o_totalprice, 0.50), 2) AS price_p50,
       round(quantile_cont(o_totalprice, 0.75), 2) AS price_p75,
       round(quantile_cont(o_totalprice, 0.99), 2) AS price_p99
FROM orders
"""


# ------------------------------------------------- cardinality per bucket


def q_agg_cardinality(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "by_type": {
                "terms": {"field": "event_type"},
                "aggs": {"users": {"cardinality": {"field": "user_id"}}},
            }
        },
    )


SQL_AGG_CARDINALITY = """
SELECT event_type AS key, count(*) AS doc_count,
       count(DISTINCT user_id) AS users
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------- deterministic HLL cardinality


def q_agg_cardinality_hll(spark, sf_dir):
    """ES cardinality is HLL at scale; this grades the ESTIMATE itself:
    the deterministic md5-based HyperLogLog (operators/sketch.py) next
    to the exact distinct count, per event_type."""
    from esbulk_spark.operators.sketch import hll_cardinality

    ev = _t(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    hll = hll_cardinality(ev, "user_id", ["event_type"], p=10)
    return (
        exact.join(hll, ["event_type"])
        .select(
            "event_type",
            "exact_users",
            F.round("hll_estimate", 4).alias("hll_users"),
        )
        .orderBy("event_type")
    )


def _sql_agg_hll() -> str:
    from esbulk_spark.operators.sketch import _alpha

    m, width = 1 << 10, 50
    scale = 1 << (width + 1)
    a = repr(_alpha(m) * m * m * float(scale))
    raw = (
        f"{a} / CAST(sum_present + ({m} - n_present) * {scale}::BIGINT"
        " AS DOUBLE)"
    )
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS UBIGINT)::BIGINT AS h
  FROM events
),
reg AS (
  SELECT event_type, h % {m} AS j,
         max({width + 1} - length(ltrim(bin(h // {m}), '0'))) AS rho
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         sum(CAST(pow(2.0, {width + 1} - rho) AS BIGINT)) AS sum_present,
         count(*) AS n_present
  FROM reg GROUP BY 1
),
est AS (
  SELECT event_type,
         CASE WHEN {raw} <= {2.5 * m} AND ({m} - n_present) > 0
              THEN {float(m)} * ln({float(m)} / ({m} - n_present))
              ELSE {raw} END AS hll
  FROM agg
)
SELECT e.event_type, e.exact_users, round(est.hll, 4) AS hll_users
FROM (SELECT event_type, count(DISTINCT user_id) AS exact_users
      FROM events GROUP BY 1) e
JOIN est USING (event_type)
ORDER BY event_type
"""


_ADJ_FILTERS = {
    "discounted": "l_discount > 0.05",
    "high_qty": "l_quantity > 25",
    "taxed": "l_tax > 0.04",
}


def q_agg_adjacency(spark, sf_dir):
    """ES adjacency_matrix agg: singles + pairwise intersections of
    overlapping lineitem predicates, one conditional-sum pass."""
    return A.adjacency_matrix_agg(_t(spark, sf_dir, "lineitem"), _ADJ_FILTERS)


def _sql_adjacency() -> str:
    names = sorted(_ADJ_FILTERS)
    parts = [
        f"SELECT '{n}' AS key, count(*) FILTER ({_ADJ_FILTERS[n]}) AS doc_count FROM lineitem"
        for n in names
    ]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            parts.append(
                f"SELECT '{a}&{b}', count(*) FILTER (({_ADJ_FILTERS[a]}) AND ({_ADJ_FILTERS[b]})) FROM lineitem"
            )
    union = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM ({union}) WHERE doc_count > 0 ORDER BY key"


# ------------------------------------------------- terms + sub-metrics, count-desc


def q_agg_terms_subagg(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "by_type": {
                "terms": {"field": "event_type", "order": "count_desc", "size": 5},
                "aggs": {
                    "avg_value": {"avg": {"field": "value"}},
                    "sum_value": {"sum": {"field": "value"}},
                },
            }
        },
    )


SQL_AGG_TERMS_SUBAGG = """
SELECT event_type AS key, count(*) AS doc_count,
       round(avg(value), 4) AS avg_value,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 5
"""


_MATRIX_FIELDS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def q_agg_matrix_stats(spark, sf_dir):
    """ES matrix_stats (correlation part): all C(4,2) Pearson pairs of
    lineitem numerics in ONE agg pass."""
    return A.matrix_stats_agg(_t(spark, sf_dir, "lineitem"), _MATRIX_FIELDS)


def _sql_matrix_stats() -> str:
    names = sorted(_MATRIX_FIELDS)
    parts = [
        f"SELECT '{a}~{b}' AS pair, round(corr({a}, {b}), 6) AS correlation FROM lineitem"
        for i, a in enumerate(names)
        for b in names[i + 1:]
    ]
    return "SELECT * FROM (" + "\nUNION ALL\n".join(parts) + ") ORDER BY pair"


def q_agg_weighted_avg(spark, sf_dir):
    """ES weighted_avg metric under a terms agg: per returnflag, the
    quantity-weighted mean discount."""
    return A.compile_aggs(
        _t(spark, sf_dir, "lineitem"),
        {
            "by_flag": {
                "terms": {"field": "l_returnflag", "order": "count_desc", "size": 5},
                "aggs": {
                    "wavg_disc": {
                        "weighted_avg": {
                            "value": {"field": "l_discount"},
                            "weight": {"field": "l_quantity"},
                        }
                    }
                },
            }
        },
    )


SQL_AGG_WEIGHTED_AVG = """
SELECT l_returnflag AS key, count(*) AS doc_count,
       round(sum(l_discount * l_quantity) / sum(l_quantity), 4) AS wavg_disc
FROM lineitem GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 5
"""


def q_agg_boxplot(spark, sf_dir):
    """ES boxplot agg (exact interpolated quartiles) per returnflag."""
    return A.compile_aggs(
        _t(spark, sf_dir, "lineitem"),
        {
            "by_flag": {
                "terms": {"field": "l_returnflag", "order": "key_asc"},
                "aggs": {"price": {"boxplot": {"field": "l_extendedprice"}}},
            }
        },
    )


SQL_AGG_BOXPLOT = """
SELECT l_returnflag AS key, count(*) AS doc_count,
       round(min(l_extendedprice), 4) AS price_min,
       round(max(l_extendedprice), 4) AS price_max,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS price_q1,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS price_q2,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS price_q3
FROM lineitem GROUP BY 1 ORDER BY key
"""


def q_agg_mad(spark, sf_dir):
    """ES median_absolute_deviation, exact two-pass per returnflag."""
    out = A.mad_agg(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", ["l_returnflag"]
    )
    return out.select(
        F.col("l_returnflag").alias("key"), "mad"
    ).orderBy("key")


SQL_AGG_MAD = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag AS key,
       round(quantile_cont(abs(l.l_extendedprice - med.m), 0.5), 4) AS mad
FROM lineitem l JOIN med USING (l_returnflag)
GROUP BY 1 ORDER BY key
"""


_SAMPLER_SIZE = 500


def q_agg_sampler(spark, sf_dir):
    """ES sampler agg: per-type value averages computed over a
    deterministic 500-event PRN sample instead of the full table."""
    sample = A.sampler_agg(
        _t(spark, sf_dir, "events"), _SAMPLER_SIZE, "event_id"
    )
    return (
        sample.groupBy("event_type")
        .agg(
            F.count("*").alias("doc_count"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .withColumnRenamed("event_type", "key")
        .orderBy("key")
    )


def _sql_agg_sampler() -> str:
    import esbulk_spark.operators.dedup as _dd

    h = _dd.DUCK_MD5_INT.format("CAST(event_id AS VARCHAR) || ':sampler'")
    return f"""
WITH sample AS (
  SELECT * FROM events
  ORDER BY {h} % 1000000 ASC, event_id ASC LIMIT {_SAMPLER_SIZE}
)
SELECT event_type AS key, count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM sample GROUP BY 1 ORDER BY key
"""


def q_agg_top_metrics(spark, sf_dir):
    """ES top_metrics: per event_type, the value carried by the LATEST
    event (argmax by ts, event_id tie-break via the window's total
    order on the partition)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_epoch", F.col("ts").cast("timestamp").cast("long")
    )
    out = A.top_metrics_agg(
        ev, ["event_type"], "ts_epoch", ["value", "event_id"],
        tie_cols=["event_id"],
    )
    return out.select(
        F.col("event_type").alias("key"), "ts_epoch", "value", "event_id"
    ).orderBy("key")


SQL_AGG_TOP_METRICS = """
SELECT event_type AS key, ts_epoch, value, event_id
FROM (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
         round(value, 4) AS value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY floor(epoch(ts)) DESC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY key
"""


def q_agg_missing(spark, sf_dir):
    """ES missing agg: count docs whose field is NULL. The events table
    has no nullable column, so the fixture derives one the same way in
    both engines (NULLIF on a predicate) — the agg machinery under
    grade is the missing-bucket path."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "maybe_type", F.expr("nullif(event_type, 'click')")
    )
    return A.compile_aggs(
        ev, {"no_type": {"missing": {"field": "maybe_type"}}}
    )


SQL_AGG_MISSING = """
SELECT 'missing' AS key, count(*) AS doc_count
FROM events WHERE nullif(event_type, 'click') IS NULL
"""


# ------------------------------------------------- filters agg


def q_agg_filters(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "named": {
                "filters": {
                    "filters": {
                        "clicks": "event_type = 'click'",
                        "errors": "event_type = 'error'",
                        "high_value": "value > 250.0",
                    }
                }
            }
        },
    )


SQL_AGG_FILTERS = """
SELECT 'clicks' AS key, count(*) FILTER (event_type = 'click') AS doc_count FROM events
UNION ALL
SELECT 'errors', count(*) FILTER (event_type = 'error') FROM events
UNION ALL
SELECT 'high_value', count(*) FILTER (value > 250.0) FROM events
ORDER BY key
"""


# ------------------------------------------------- composite paging


_COMPOSITE_AFTER = ["en", "src12"]


def q_agg_composite(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "documents"),
        {
            "pages": {
                "composite": {
                    "sources": [
                        {"lang": {"terms": {"field": "lang"}}},
                        {"source": {"terms": {"field": "source"}}},
                    ],
                    "size": 5,
                    "after": _COMPOSITE_AFTER,
                }
            }
        },
    )


SQL_AGG_COMPOSITE = f"""
SELECT lang, source, count(*) AS doc_count
FROM documents
GROUP BY lang, source
HAVING (lang > '{_COMPOSITE_AFTER[0]}')
    OR (lang = '{_COMPOSITE_AFTER[0]}' AND source > '{_COMPOSITE_AFTER[1]}')
ORDER BY lang, source LIMIT 5
"""


# ------------------------------------------------- nested bucket (terms x day)


def q_agg_nested_type_day(spark, sf_dir):
    return A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "by_type": {
                "terms": {"field": "event_type"},
                "aggs": {
                    "by_day": {
                        "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                        "aggs": {"avg_value": {"avg": {"field": "value"}}},
                    }
                },
            }
        },
    )


SQL_AGG_NESTED = """
SELECT event_type AS key,
       (floor(epoch(ts) / 86400))::BIGINT * 86400 AS key_2,
       count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------- top_hits


def q_agg_top_hits(spark, sf_dir):
    return A.top_hits(
        _t(spark, sf_dir, "documents"),
        group_field="lang",
        sort=[("n_chars", "desc"), ("doc_id", "asc")],
        size=2,
        select=["doc_id", "n_chars"],
    )


SQL_AGG_TOP_HITS = """
SELECT lang, hit_rank, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS hit_rank
  FROM documents
) WHERE hit_rank <= 2 ORDER BY lang, hit_rank
"""


# ------------------------------------------------- pipeline aggs


def q_agg_pipeline_cumsum(spark, sf_dir):
    """Daily value sums + derivative + cumulative_sum pipeline aggs
    (ES derivative/cumulative_sum over a date_histogram parent)."""
    buckets = A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "by_day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {"total": {"sum": {"field": "value"}}},
            }
        },
    )
    return A.pipeline_aggs(
        buckets,
        {
            "deriv": {"derivative": {"buckets_path": "total"}},
            "running": {"cumulative_sum": {"buckets_path": "total"}},
        },
    )


SQL_AGG_PIPELINE_CUMSUM = """
WITH b AS (
  SELECT (floor(epoch(ts) / 86400))::BIGINT * 86400 AS key,
         count(*) AS doc_count,
         round(sum(value), 4) AS total
  FROM events GROUP BY 1
)
SELECT key, doc_count, total,
       round(total - lag(total) OVER (ORDER BY key), 4) AS deriv,
       round(sum(total) OVER (ORDER BY key
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
FROM b ORDER BY key
"""


def q_agg_moving_fn(spark, sf_dir):
    """moving_fn unweightedAvg (window=3, shift=0 — ES default excludes
    the current bucket) over daily doc_count."""
    buckets = A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {"by_day": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}},
    )
    return A.pipeline_aggs(
        buckets,
        {"mov3": {"moving_fn": {"buckets_path": "doc_count", "window": 3,
                                "script": "MovingFunctions.unweightedAvg"}}},
    )


SQL_AGG_MOVING_FN = """
WITH b AS (
  SELECT (floor(epoch(ts) / 86400))::BIGINT * 86400 AS key,
         count(*) AS doc_count
  FROM events GROUP BY 1
)
SELECT key, doc_count,
       round(avg(doc_count) OVER (ORDER BY key
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) AS mov3
FROM b ORDER BY key
"""


def q_agg_bucket_script_selector(spark, sf_dir):
    """bucket_script per-bucket ratio feeding a bucket_selector filter
    (ES pipeline DAG: script output usable by later pipelines)."""
    buckets = A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "by_type": {
                "terms": {"field": "event_type"},
                "aggs": {"total": {"sum": {"field": "value"}}},
            }
        },
    )
    return A.pipeline_aggs(
        buckets,
        {
            "per_doc": {"bucket_script": {
                "buckets_path": {"t": "total", "n": "doc_count"},
                "script": "params.t / params.n"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"p": "per_doc"},
                "script": "params.p > 0"}},
        },
    )


SQL_AGG_BUCKET_SCRIPT = """
WITH b AS (
  SELECT event_type AS key, count(*) AS doc_count,
         round(sum(value), 4) AS total
  FROM events GROUP BY 1
)
SELECT key, doc_count, total,
       round(total / doc_count, 4) AS per_doc
FROM b WHERE round(total / doc_count, 4) > 0 ORDER BY key
"""


def q_agg_stats_bucket(spark, sf_dir):
    """stats_bucket sibling pipeline: one row summarizing the daily sum
    metric across all date_histogram buckets."""
    buckets = A.compile_aggs(
        _t(spark, sf_dir, "events"),
        {
            "by_day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {"total": {"sum": {"field": "value"}}},
            }
        },
    )
    return A.sibling_bucket_agg(buckets, "stats_bucket", "total")


SQL_AGG_STATS_BUCKET = """
WITH b AS (
  SELECT (floor(epoch(ts) / 86400))::BIGINT * 86400 AS key,
         round(sum(value), 4) AS total
  FROM events GROUP BY 1
)
SELECT count(total) AS count, round(min(total), 4) AS min,
       round(max(total), 4) AS max, round(avg(total), 4) AS avg,
       round(sum(total), 4) AS sum
FROM b
"""


AGG_QUERIES = {
    "agg_date_histogram": (q_agg_date_histogram, SQL_AGG_DATE_HISTOGRAM),
    "agg_histogram_price": (q_agg_histogram_price, SQL_AGG_HISTOGRAM_PRICE),
    "agg_range_quantity": (q_agg_range_quantity, SQL_AGG_RANGE_QUANTITY),
    "agg_extended_stats": (q_agg_extended_stats, SQL_AGG_EXTENDED_STATS),
    "agg_percentiles": (q_agg_percentiles, SQL_AGG_PERCENTILES),
    "agg_cardinality_by_type": (q_agg_cardinality, SQL_AGG_CARDINALITY),
    "agg_cardinality_hll": (q_agg_cardinality_hll, _sql_agg_hll()),
    "agg_terms_subagg": (q_agg_terms_subagg, SQL_AGG_TERMS_SUBAGG),
    "agg_filters_named": (q_agg_filters, SQL_AGG_FILTERS),
    "agg_adjacency_matrix": (q_agg_adjacency, _sql_adjacency()),
    "agg_matrix_stats_corr": (q_agg_matrix_stats, _sql_matrix_stats()),
    "agg_weighted_avg": (q_agg_weighted_avg, SQL_AGG_WEIGHTED_AVG),
    "agg_boxplot_price": (q_agg_boxplot, SQL_AGG_BOXPLOT),
    "agg_mad_price": (q_agg_mad, SQL_AGG_MAD),
    "agg_sampler_avg": (q_agg_sampler, _sql_agg_sampler()),
    "agg_top_metrics_latest": (q_agg_top_metrics, SQL_AGG_TOP_METRICS),
    "agg_missing_bucket": (q_agg_missing, SQL_AGG_MISSING),
    "agg_composite_page": (q_agg_composite, SQL_AGG_COMPOSITE),
    "agg_nested_type_day": (q_agg_nested_type_day, SQL_AGG_NESTED),
    "agg_top_hits_per_lang": (q_agg_top_hits, SQL_AGG_TOP_HITS),
    "agg_pipeline_cumsum": (q_agg_pipeline_cumsum, SQL_AGG_PIPELINE_CUMSUM),
    "agg_moving_fn_window3": (q_agg_moving_fn, SQL_AGG_MOVING_FN),
    "agg_bucket_script_selector": (
        q_agg_bucket_script_selector, SQL_AGG_BUCKET_SCRIPT),
    "agg_stats_bucket_daily": (q_agg_stats_bucket, SQL_AGG_STATS_BUCKET),
}
