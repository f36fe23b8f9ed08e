"""Deterministic HLL sketch: merge identity and estimate accuracy."""

import pytest
from pyspark.sql import functions as F

from esbulk_spark.operators.sketch import (
    hll_cardinality,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _df(spark, ids, grp="g"):
    return spark.createDataFrame([(grp, i) for i in ids], ["g", "v"])


def test_hll_merge_equals_sketch_of_union(spark):
    a = _df(spark, range(0, 3000))
    b = _df(spark, range(2000, 6000))
    u = _df(spark, range(0, 6000))
    merged = hll_merge(
        hll_sketch(a, "v", ["g"]), hll_sketch(b, "v", ["g"])
    )
    direct = hll_sketch(u, "v", ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est_m = hll_estimate(merged, ["g"]).collect()[0]["hll_estimate"]
    est_d = hll_estimate(direct, ["g"]).collect()[0]["hll_estimate"]
    assert est_m == est_d


@pytest.mark.parametrize("n", [50, 500, 20000])
def test_hll_estimate_within_error_bound(spark, n):
    # p=10 -> rse ~ 1.04/sqrt(1024) ~ 3.25%; allow 4 sigma
    df = _df(spark, range(n))
    est = hll_cardinality(df, "v", ["g"], p=10).collect()[0]["hll_estimate"]
    assert est == pytest.approx(n, rel=4 * 1.04 / 32)


def test_hll_multiple_groups_independent(spark):
    rows = [("a", i) for i in range(1000)] + [("b", i) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r["hll_estimate"] for r in
           hll_cardinality(df, "v", ["g"]).collect()}
    assert out["a"] == pytest.approx(1000, rel=0.15)
    assert out["b"] == pytest.approx(10, rel=0.15)
