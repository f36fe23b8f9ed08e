"""Z-order layout: Morton key correctness and multi-column row-group
pruning measured from real parquet footer stats."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from esbulk_spark.operators.layout import morton_interleave, zorder_write


def _interleave_py(vals, bits):
    z = 0
    for b in range(bits - 1, -1, -1):
        for v in vals:
            z = (z << 1) | ((v >> b) & 1)
    return z


def test_morton_key_matches_python(spark):
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r[0]
        for r in df.select(
            morton_interleave([F.col("a"), F.col("b")], 3)
        ).collect()
    ]
    assert got == [_interleave_py([a, b], 3) for a, b in rows]


def _matching_rowgroups(path_dir, col, lo, hi):
    """(matching, total) row groups whose [min,max] stats overlap [lo,hi]."""
    import glob
    match = total = 0
    for f in glob.glob(f"{path_dir}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                match += 1
    return match, total


def test_zorder_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order by (user_id, value) keeps row-group min/max narrow on
    BOTH columns: a selective predicate on either prunes most row
    groups, where a ts-sorted layout prunes (almost) none."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "value", "ts"
    )
    zdir, tdir = str(tmp_path / "z"), str(tmp_path / "t")
    zorder_write(ev, ["user_id", "value"], zdir, bits=6, n_files=16)
    (
        ev.repartitionByRange(16, "ts").sortWithinPartitions("ts")
        .write.parquet(tdir)
    )

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    ulo, uhi = stats[0], stats[1]
    uq = (ulo + (uhi - ulo) * 0.40, ulo + (uhi - ulo) * 0.45)  # 5% band
    vlo, vhi = stats[2], stats[3]
    vq = (vlo + (vhi - vlo) * 0.40, vlo + (vhi - vlo) * 0.45)

    for col, (lo, hi) in (("user_id", uq), ("value", vq)):
        zm, zt = _matching_rowgroups(zdir, col, lo, hi)
        tm, tt = _matching_rowgroups(tdir, col, lo, hi)
        assert zt >= 8, "need multiple row groups for the claim"
        # z-order prunes a majority on each dim; ts-sort prunes ~nothing
        assert zm / zt < 0.5 < tm / tt, (col, zm, zt, tm, tt)

    # layout changes bytes, not content
    a = spark.read.parquet(zdir).orderBy("user_id", "value", "ts").collect()
    b = ev.orderBy("user_id", "value", "ts").collect()
    assert a == b
