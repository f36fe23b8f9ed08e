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


def test_cms_overestimates_never_under(spark):
    from esbulk_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [("hot",)] * 500 + [(f"w{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, ["v"])
    sk = cms_sketch(df, "v", d=4, w=256)  # narrow -> collisions likely
    cand = spark.createDataFrame(
        [("hot",), ("w0",), ("absent",)], ["v"]
    )
    got = {r["v"]: r["cms_count"] for r in
           cms_estimate(sk, cand, "v", d=4, w=256).collect()}
    assert got["hot"] >= 500
    assert got["w0"] >= 1
    # one-sided error bound: eps = e/w over total mass (2500), 4 rows
    assert got["hot"] <= 500 + 4 * 2500 // 256
    assert got["absent"] >= 0


def test_cms_grouped_estimate_one_sided_per_group(spark):
    """A grouped sketch probed with group_cols gives per-group counts
    that never under-count WITHIN the group; probing it without
    group_cols (which would min() across groups) raises."""
    import pytest

    from esbulk_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [("a", "hot")] * 300 + [("b", "hot")] * 7 + [
        ("b", f"w{i}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    sk = cms_sketch(df, "v", group_cols=["g"], d=4, w=256)
    cand = spark.createDataFrame([("hot",), ("w0",), ("absent",)], ["v"])
    got = {(r["g"], r["v"]): r["cms_count"] for r in
           cms_estimate(sk, cand, "v", d=4, w=256, group_cols=["g"]).collect()}
    assert got[("a", "hot")] >= 300
    assert got[("b", "hot")] >= 7
    # the cross-group min bug would report <=7 for group a's hot count
    assert got[("a", "w0")] >= 0 and got[("b", "w0")] >= 1
    assert got[("a", "absent")] >= 0
    with pytest.raises(ValueError):
        cms_estimate(sk, cand, "v", d=4, w=256)


def test_cms_merge_equals_sketch_of_concat(spark):
    from esbulk_spark.operators.sketch import cms_merge, cms_sketch

    a = spark.createDataFrame([(f"x{i % 50}",) for i in range(300)], ["v"])
    b = spark.createDataFrame([(f"x{i % 80}",) for i in range(400)], ["v"])
    u = a.unionAll(b)
    merged = cms_merge(cms_sketch(a, "v", d=3, w=128),
                       cms_sketch(b, "v", d=3, w=128))
    direct = cms_sketch(u, "v", d=3, w=128)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_sketch_estimates_partitioning_invariant(spark):
    """HLL and CMS outputs are exactly identical under any input
    partitioning (integer-exact aggregation — no float summation
    order anywhere), the property that makes the graded estimates
    reproducible on a 1000-executor cluster."""
    from esbulk_spark.operators.sketch import cms_sketch, hll_cardinality

    rows = [("g", i % 700) for i in range(5000)]
    base = spark.createDataFrame(rows, ["g", "v"])
    for parts in (1, 7, 32):
        df = base.repartition(parts)
        est = hll_cardinality(df, "v", ["g"]).collect()[0]["hll_estimate"]
        ref = hll_cardinality(base.coalesce(1), "v", ["g"]).collect()[0][
            "hll_estimate"
        ]
        assert est == ref  # bit-identical, not approx
        sk = sorted(map(tuple, cms_sketch(df, "v", d=3, w=256).collect()))
        skr = sorted(
            map(tuple, cms_sketch(base.coalesce(1), "v", d=3, w=256).collect())
        )
        assert sk == skr
