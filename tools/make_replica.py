"""Build an id-shifted Nx replication of an sf testdata dir (guide §1:
measure at the scale the driver measures). Used for DECIDING scale-
sensitive optimizations only — never for claiming driver numbers.

Each copy shifts every integer key column by i * stride so joins and
group-bys keep their cardinality shape (keys stay distinct across
copies); non-key columns are left as-is, so value distributions (and
hot terms) replicate naturally.

Usage: python tools/make_replica.py [src_sf_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-table integer id columns to shift (keys that must stay distinct
# across copies); every other column is copied verbatim. Only the
# tables feeding the scale-heavy entries replicate; the TPC-shaped
# dimension/fact tables copy once (their entries are sub-second and
# referential strides would have to be coordinated across tables).
SHIFT_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}
COPY_ONCE = [
    "orders", "lineitem", "customer", "part", "supplier", "nation", "region",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from esbulk_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="make-replica", cpus=cpus,
                      shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for tbl in COPY_ONCE:
        p = os.path.join(src, f"{tbl}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.mode("overwrite").parquet(
                os.path.join(dst, f"{tbl}.parquet"))
            print(f"{tbl}: copied x1", flush=True)
    for tbl, cols in SHIFT_COLS.items():
        p = os.path.join(src, f"{tbl}.parquet")
        if not os.path.exists(p):
            continue
        df = spark.read.parquet(p)
        mx = df.agg(*[F.max(F.abs(F.col(c))) for c in cols]).collect()[0]
        stride = 1 << (int(max([v or 0 for v in mx] + [1]))).bit_length()
        parts = []
        for i in range(factor):
            d = df
            for c in cols:
                d = d.withColumn(c, (F.col(c) + F.lit(i * stride)).cast(
                    dict(df.dtypes)[c]))
            parts.append(d)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{tbl}.parquet"))
        print(f"{tbl}: written x{factor}", flush=True)
    # driver-dir convention marker
    open(os.path.join(dst, "_DONE"), "w").close()
    spark.stop()


if __name__ == "__main__":
    main()
