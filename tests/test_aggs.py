"""ES aggregation framework (esbulk_spark/plans/aggs.py) unit tests:
bucket semantics, paging cursors, metric derivations, plan shape."""

import datetime

import pytest
from pyspark.sql import functions as F

from esbulk_spark.plans import aggs as A


@pytest.fixture(scope="module")
def edf(spark):
    rows = [
        # (id, grp, val, ts)
        (1, "a", 10.0, datetime.datetime(2024, 1, 1, 0, 30)),
        (2, "a", 20.0, datetime.datetime(2024, 1, 1, 13, 0)),
        (3, "b", 30.0, datetime.datetime(2024, 1, 2, 1, 0)),
        (4, "b", 40.0, datetime.datetime(2024, 1, 2, 2, 0)),
        (5, "b", None, datetime.datetime(2024, 1, 3, 5, 0)),
        (6, None, 60.0, datetime.datetime(2024, 1, 3, 6, 0)),
    ]
    return spark.createDataFrame(
        rows, "id long, grp string, val double, ts timestamp"
    ).cache()


def test_fixed_interval_parse():
    assert A.fixed_interval_seconds("30s") == 30
    assert A.fixed_interval_seconds("15m") == 900
    assert A.fixed_interval_seconds("1h") == 3600
    assert A.fixed_interval_seconds("2d") == 172800
    with pytest.raises(ValueError):
        A.fixed_interval_seconds("1w")
    with pytest.raises(ValueError):
        A.fixed_interval_seconds("500ms")


def test_date_histogram_day_buckets(edf):
    out = A.compile_aggs(
        edf, {"d": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}}
    ).collect()
    # 3 calendar days; keys are floored epoch seconds, ascending
    assert [r.doc_count for r in out] == [2, 2, 2]
    keys = [r.key for r in out]
    assert keys == sorted(keys) and all(k % 86400 == 0 for k in keys)


def test_histogram_offset_and_min_doc_count(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 3, 11, 12, 29]], "v double"
    )
    out = A.compile_aggs(
        df,
        {"h": {"histogram": {"field": "v", "interval": 10, "offset": 1,
                             "min_doc_count": 2}}},
    ).collect()
    # buckets [1,11): 3 rows, [11,21): 2 rows, [21,31): 1 row (filtered)
    assert [(r.key, r.doc_count) for r in out] == [(1.0, 3), (11.0, 2)]


def test_range_half_open_and_null_drop(edf):
    out = A.compile_aggs(
        edf,
        {
            "r": {
                "range": {
                    "field": "val",
                    "ranges": [
                        {"to": 20, "key": "lo"},
                        {"from": 20, "to": 40, "key": "mid"},
                        {"from": 40, "key": "hi"},
                    ],
                }
            }
        },
    ).collect()
    # val=None drops; 20 goes to mid (half-open), 40 to hi
    got = {r.key: r.doc_count for r in out}
    assert got == {"lo": 1, "mid": 2, "hi": 2}


def test_missing_bucket(edf):
    out = A.compile_aggs(edf, {"m": {"missing": {"field": "grp"}}}).collect()
    assert [(r.key, r.doc_count) for r in out] == [("missing", 1)]


def test_terms_count_desc_with_metrics(edf):
    out = A.compile_aggs(
        edf,
        {
            "g": {
                "terms": {"field": "grp", "order": "count_desc", "size": 2},
                "aggs": {
                    "avg_v": {"avg": {"field": "val"}},
                    "n_v": {"value_count": {"field": "val"}},
                },
            }
        },
    ).collect()
    assert [(r.key, r.doc_count, r.avg_v, r.n_v) for r in out] == [
        ("b", 3, 35.0, 2),  # None val not counted in avg/value_count
        ("a", 2, 15.0, 2),
    ]
    # NULL group key dropped (ES terms agg skips missing unless `missing` set)


def test_extended_stats_population_moments(spark):
    df = spark.createDataFrame([(2.0,), (4.0,), (4.0,), (4.0,), (5.0,), (5.0,), (7.0,), (9.0,)], "v double")
    row = A.compile_aggs(df, {"s": {"extended_stats": {"field": "v"}}}).collect()[0]
    assert row.s_count == 8 and row.s_min == 2.0 and row.s_max == 9.0
    assert row.s_avg == 5.0 and row.s_sum == 40.0
    assert row.s_variance == 4.0 and row.s_std_deviation == 2.0  # population


def test_percentiles_exact_interpolation(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "v double")
    row = A.compile_aggs(
        df, {"p": {"percentiles": {"field": "v", "percents": [50.0, 99.0]}}}
    ).collect()[0]
    assert row.p_p50 == 50.5  # (n-1)*p linear interpolation
    assert row.p_p99 == 99.01
    assert set(row.asDict()) == {"p_p50", "p_p99"}


def test_cardinality_exact_and_approx(edf):
    exact = A.compile_aggs(
        edf, {"c": {"cardinality": {"field": "grp"}}}
    ).collect()[0].c
    assert exact == 2
    approx = A.compile_aggs(
        edf, {"c": {"cardinality": {"field": "grp", "approx": True}}}
    ).collect()[0].c
    assert approx == 2  # tiny input: HLL++ is exact


def test_filters_single_pass(edf):
    out = A.compile_aggs(
        edf,
        {"f": {"filters": {"filters": {
            "big": "val >= 30", "grp_a": "grp = 'a'", "none": "val < 0"}}}},
    ).collect()
    assert [(r.key, r.doc_count) for r in out] == [
        ("big", 3), ("grp_a", 2), ("none", 0)
    ]


def test_composite_pages_tile(edf):
    spec = {"sources": [{"g": {"terms": {"field": "grp"}}},
                        {"i": {"terms": {"field": "id"}}}]}
    page1 = A.composite_agg(edf.filter(F.col("grp").isNotNull()),
                            spec["sources"], size=2).collect()
    assert [(r.g, r.i) for r in page1] == [("a", "1"), ("a", "2")]
    after = [page1[-1].g, page1[-1].i]
    page2 = A.composite_agg(edf.filter(F.col("grp").isNotNull()),
                            spec["sources"], size=2, after=after).collect()
    assert [(r.g, r.i) for r in page2] == [("b", "3"), ("b", "4")]
    # cursor predicate sits below the limit: deep pages never rescan
    plan = A.composite_agg(
        edf, spec["sources"], size=2, after=["a", "2"]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" in plan and plan.index("Filter") > plan.index("GlobalLimit")


def test_top_hits_per_bucket(edf):
    out = A.top_hits(
        edf.filter(F.col("grp").isNotNull() & F.col("val").isNotNull()),
        group_field="grp", sort=[("val", "desc"), ("id", "asc")],
        size=1, select=["id", "val"],
    ).collect()
    assert [(r.grp, r.hit_rank, r.id) for r in out] == [("a", 1, 2), ("b", 1, 4)]


def test_nested_bucket_flattened(edf):
    out = A.compile_aggs(
        edf.filter(F.col("grp").isNotNull()),
        {
            "g": {
                "terms": {"field": "grp"},
                "aggs": {
                    "d": {
                        "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                        "aggs": {"s": {"sum": {"field": "val"}}},
                    }
                },
            }
        },
    ).collect()
    assert [c for c in out[0].asDict()] == ["key", "key_2", "doc_count", "s"]
    assert [r.doc_count for r in out] == [2, 2, 1]  # a/day1=2, b/day2=2, b/day3=1


def test_single_shuffle_plan(edf):
    """The whole bucket+metrics spec compiles to ONE exchange."""
    df = A.compile_aggs(
        edf,
        {
            "g": {
                "terms": {"field": "grp"},
                "aggs": {"a": {"avg": {"field": "val"}},
                         "s": {"stats": {"field": "val"}}},
            }
        },
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one hash-agg exchange + the final tiny ordering exchange (rangepartitioning)
    n_hash_exchanges = plan.count("hashpartitioning")
    assert n_hash_exchanges == 1, plan


# ------------------------------------------------------------ pipelines


@pytest.fixture(scope="module")
def bucket_frame(spark):
    # a compiled-bucket-shaped frame: (key, doc_count, total)
    rows = [(0, 2, 10.0), (86400, 3, 30.0), (172800, 1, 20.0), (259200, 4, 40.0)]
    return spark.createDataFrame(rows, "key long, doc_count long, total double")


def test_pipeline_derivative_and_cumsum(bucket_frame):
    out = A.pipeline_aggs(
        bucket_frame,
        {
            "deriv": {"derivative": {"buckets_path": "total"}},
            "cum": {"cumulative_sum": {"buckets_path": "total"}},
        },
    ).orderBy("key").collect()
    assert [r.deriv for r in out] == [None, 20.0, -10.0, 20.0]
    assert [r.cum for r in out] == [10.0, 40.0, 60.0, 100.0]


def test_pipeline_serial_diff_lag2(bucket_frame):
    out = A.pipeline_aggs(
        bucket_frame,
        {"sd": {"serial_diff": {"buckets_path": "total", "lag": 2}}},
    ).orderBy("key").collect()
    assert [r.sd for r in out] == [None, None, 10.0, 10.0]


def test_pipeline_moving_fn_excludes_current_by_default(bucket_frame):
    # ES moving_fn shift=0: window is the n buckets BEFORE the current one
    out = A.pipeline_aggs(
        bucket_frame,
        {"mf": {"moving_fn": {"buckets_path": "total", "window": 2,
                              "script": "MovingFunctions.unweightedAvg"}}},
    ).orderBy("key").collect()
    assert [r.mf for r in out] == [None, 10.0, 20.0, 25.0]
    # shift=1 includes the current bucket
    out = A.pipeline_aggs(
        bucket_frame,
        {"mf": {"moving_fn": {"buckets_path": "total", "window": 2,
                              "script": "max", "shift": 1}}},
    ).orderBy("key").collect()
    assert [r.mf for r in out] == [10.0, 30.0, 30.0, 40.0]


def test_pipeline_bucket_script_then_selector(bucket_frame):
    # bucket_script output feeds the later bucket_selector (ES DAG order)
    out = A.pipeline_aggs(
        bucket_frame,
        {
            "per_doc": {"bucket_script": {
                "buckets_path": {"t": "total", "n": "doc_count"},
                "script": "params.t / params.n"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"p": "per_doc"},
                "script": "params.p >= 10"}},
        },
    ).orderBy("key").collect()
    assert [(r.key, r.per_doc) for r in out] == [(0, 5.0), (86400, 10.0), (172800, 20.0), (259200, 10.0)][1:]


def test_pipeline_bucket_sort_size_from(bucket_frame):
    out = A.pipeline_aggs(
        bucket_frame,
        {"bs": {"bucket_sort": {"sort": [("total", "desc")], "from": 1, "size": 2}}},
    ).collect()
    assert [r.total for r in out] == [30.0, 20.0]


def test_pipeline_script_rejects_unknown_grammar(bucket_frame):
    with pytest.raises(ValueError):
        A.pipeline_aggs(
            bucket_frame,
            {"x": {"bucket_script": {"buckets_path": {"t": "total"},
                                     "script": "t; drop table"}}},
        )


def test_sibling_bucket_aggs(bucket_frame):
    row = A.sibling_bucket_agg(bucket_frame, "avg_bucket", "total").collect()[0]
    assert row.value == 25.0
    row = A.sibling_bucket_agg(bucket_frame, "stats_bucket", "total").collect()[0]
    assert (row["count"], row["min"], row["max"], row["avg"], row["sum"]) == (
        4, 10.0, 40.0, 25.0, 100.0)


def test_sampler_agg_deterministic_any_partitioning(spark):
    from esbulk_spark.plans.aggs import sampler_agg

    rows = [(i, f"t{i % 4}", float(i)) for i in range(2000)]
    base = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    a = sorted(map(tuple, sampler_agg(base, 100, "event_id").collect()))
    b = sorted(
        map(tuple, sampler_agg(base.repartition(13), 100, "event_id").collect())
    )
    assert a == b and len(a) == 100
