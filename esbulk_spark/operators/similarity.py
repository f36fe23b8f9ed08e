"""Similarity search over embedding columns (training-data pipeline op).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (candidates drop from O(n) per query to the
query's bucket ± multiprobe neighbors). Dot products stay JVM-side via
zip_with/aggregate — no Python in the scan. An IVF variant (k-means
coarse quantizer) is the natural next step; LSH chosen first because it
needs no training pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    out = df.select(
        F.col(id_col).alias("id"),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))).alias("cosine"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    if round_to is not None:
        out = out.withColumn("cosine", F.round("cosine", round_to))
    return out.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def hyperplane_signature(
    df: DataFrame, vec_col: str, id_col: str, n_planes: int = 8, dim: int = 64, seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of <v, r_i> -> integer bucket."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig = None
    for i in range(n_planes):
        r = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(F.col(vec_col), r) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sig.alias("bucket"))


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.3,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b,
    round(cosine, 6) >= threshold), LSH-bucketed candidate generation.

    Candidates = pairs whose hyperplane buckets are within Hamming
    distance 1 (probe-bucket equi-join, NOT an all-pairs product — the
    join key is the probed bucket id, so fan-out per key is bucket
    population). Exact cosine is then computed JVM-side for candidates
    only. Deterministic given the seed: the DuckDB oracle reproduces the
    same buckets from the same inlined hyperplanes. At cluster scale,
    write the signature table partitioned by bucket and raise n_planes
    so bucket population stays bounded."""
    table = hyperplane_signature(df, vec_col, id_col, n_planes, dim, seed)
    probe_buckets = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    probes = table.select(
        F.col("id").alias("id_a"), F.explode(probe_buckets).alias("pb")
    )
    cand = (
        probes.join(
            table.select(F.col("id").alias("id_b"), F.col("bucket").alias("pb")),
            "pb",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = table.select("id", "vec")
    out = (
        cand.join(
            vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va")), "id_a"
        )
        .join(
            vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb")), "id_b"
        )
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ),
        )
        # threshold on the ROUNDED cosine: boundary-stable cross-engine
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return out


def deterministic_kmeans(vectors, k: int = 8, seed: int = 42, iters: int = 5):
    """Driver-side Lloyd's k-means, bitwise-reproducible: seeded init
    (choice without replacement over the given row order), a FIXED
    iteration count, argmin ties -> lowest index, and an empty cluster
    keeps its previous centroid. Callers must pass vectors in a stable
    order (sort by id) so the float summation order is fixed.

    This exists so the IVF *entry* has a quantizer that a SQL oracle can
    replay exactly (centroid literals inlined into DuckDB) — Spark's
    KMeans (k-means||) is not reproducible across engines. For real
    corpora use ivf_build/ivf_ann_topk; train on a sample at scale."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    rng = np.random.RandomState(seed)
    idx = np.sort(rng.choice(len(X), size=k, replace=False))
    C = X[idx].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # first occurrence on ties
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ivf_ann_topk_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vecs: dict[str, list[float]],
    centroids,
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """IVF ANN with an externally-supplied coarse quantizer (centroid
    matrix, e.g. from deterministic_kmeans). Fully deterministic and
    SQL-reproducible: list assignment is pure Catalyst — squared-L2 to
    each centroid literal, ROUNDED to 6 dp, argmin with lowest-index
    ties — and probe lists are chosen driver-side from the same rounded
    distances. Exact DuckDB oracle: entry_queries._sql_ann_ivf.

    Scale shape is identical to ivf_search: candidates = broadcast
    (qid, list_id, qvec) equi-joined on list_id (partition-prunable when
    the table is written PARTITIONED BY list_id), never all-pairs."""
    import numpy as np
    from pyspark.sql.window import Window

    C = np.asarray(centroids, dtype=np.float64)
    n_lists = len(C)

    def _sqd(vec, c):
        arr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(
                vec, arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dists = F.array(
        *[F.round(_sqd(F.col(vec_col), C[j]), 6) for j in range(n_lists)]
    )
    assigned = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("list_id"),
    )
    rows = []
    for qid, v in query_vecs.items():
        q = np.asarray(v, dtype=np.float64)
        d2r = np.round(((C - q) ** 2).sum(axis=1), 6)
        order = np.lexsort((np.arange(n_lists), d2r))  # stable (dist, index)
        for li in order[:n_probe]:
            rows.append((qid, int(li), [float(x) for x in v]))
    qdf = df.sparkSession.createDataFrame(
        rows, "qid string, list_id int, qvec array<double>"
    )
    joined = assigned.join(F.broadcast(qdf), "list_id").select(
        "qid",
        "id",
        F.round(
            _dot(F.col("vec"), F.col("qvec"))
            / (_norm(F.col("vec")) * _norm(F.col("qvec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "id", "cosine")
        .orderBy("qid", F.desc("cosine"), F.asc("id"))
    )


def ivf_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vecs: dict[str, list[float]],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer assigns each
    vector to its nearest centroid list; a query scans only its n_probe
    closest lists. The trained counterpart of the LSH path — better
    candidate quality on clustered embeddings, at the cost of a training
    pass. Returns (qid, id, cosine) per-query top-k.

    At cluster scale the table is WRITTEN partitioned by ``list_id``
    (static partition pruning per query), and training runs on a sample."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.window import Window

    feat = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "features"
        ),
    )
    km = KMeans(k=n_lists, seed=seed, initMode="k-means||").fit(feat)
    assigned = km.transform(feat).withColumnRenamed("prediction", "list_id")
    # clusterCenters() returns numpy arrays on this PySpark; np.asarray
    # also tolerates older versions that return ml Vectors
    centroids = np.vstack([np.asarray(c) for c in km.clusterCenters()])

    rows = []
    for qid, v in query_vecs.items():
        q = np.asarray(v, dtype=np.float64)
        d2 = ((centroids - q) ** 2).sum(axis=1)
        for li in np.argsort(d2)[:n_probe]:
            rows.append((qid, int(li), [float(x) for x in v]))
    qdf = df.sparkSession.createDataFrame(rows, "qid string, list_id int, qvec array<double>")
    joined = assigned.join(F.broadcast(qdf), "list_id").select(
        "qid",
        "id",
        (_dot(F.col("vec"), F.col("qvec")) / (_norm(F.col("vec")) * _norm(F.col("qvec")))).alias("cosine"),
    )
    # rank by the ROUNDED cosine so the k-th boundary selection is stable
    # across engines (same contract as plans/score.topk_deterministic)
    joined = joined.withColumn("cosine", F.round("cosine", 6))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "id", "cosine")
        .orderBy("qid", F.desc("cosine"), F.asc("id"))
    )


def ivf_build(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_dir: str,
    n_lists: int = 16,
    seed: int = 42,
    train_fraction: float | None = None,
) -> dict:
    """Materialized IVF layout — the ANN scale path the in-memory
    ivf_ann_topk only documents: k-means coarse quantizer (trained on a
    sample when ``train_fraction`` is set — the 10^9-vector mode), then
    the vector table WRITTEN PARTITIONED BY list_id with centroids in a
    JSON sidecar. Queries read only their n_probe list directories:
    static partition pruning, visible as PartitionFilters in the plan
    (asserted in tests/test_operators.py)."""
    import json
    import os

    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "features"
        ),
    )
    train = feat.sample(train_fraction, seed=seed) if train_fraction else feat
    km = KMeans(k=n_lists, seed=seed, initMode="k-means||").fit(train)
    assigned = km.transform(feat).withColumnRenamed("prediction", "list_id")
    (
        assigned.select("id", "vec", "list_id")
        .repartition(n_lists, "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    centroids = [
        [float(x) for x in np.asarray(c)] for c in km.clusterCenters()
    ]
    meta = {"n_lists": n_lists, "seed": seed, "centroids": centroids}
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_search(
    spark,
    out_dir: str,
    query_vecs: dict[str, list[float]],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Query the materialized IVF layout: probe lists are chosen
    DRIVER-side from the centroid sidecar (no Spark job), so the
    vectors scan carries ``list_id IN (...)`` literals -> partition
    pruning; candidates join the broadcast (qid, list_id, qvec) table.
    Returns (qid, id, cosine) per-query top-k, rounded ranking."""
    import json
    import os

    import numpy as np
    from pyspark.sql.window import Window

    meta = json.load(open(os.path.join(out_dir, "centroids.json")))
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    rows = []
    for qid, v in query_vecs.items():
        q = np.asarray(v, dtype=np.float64)
        d2 = ((centroids - q) ** 2).sum(axis=1)
        for li in np.argsort(d2)[:n_probe]:
            rows.append((qid, int(li), [float(x) for x in v]))
    qdf = spark.createDataFrame(rows, "qid string, list_id int, qvec array<double>")
    all_lists = sorted({r[1] for r in rows})
    vectors = spark.read.parquet(os.path.join(out_dir, "vectors")).filter(
        F.col("list_id").isin(all_lists)
    )
    joined = vectors.join(F.broadcast(qdf), "list_id").select(
        "qid",
        "id",
        (
            _dot(F.col("vec"), F.col("qvec"))
            / (_norm(F.col("vec")) * _norm(F.col("qvec")))
        ).alias("cosine"),
    )
    joined = joined.withColumn("cosine", F.round("cosine", 6))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "id", "cosine")
        .orderBy("qid", F.desc("cosine"), F.asc("id"))
    )


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vecs: dict[str, list[float]],
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 2,
) -> DataFrame:
    """Approximate NN: score only vectors in the query's LSH bucket or
    buckets at Hamming distance <= multiprobe. Returns (qid, id, cosine).

    Plane count trades recall vs candidate volume: 2^n_planes buckets
    should be ~sqrt-ish of corpus size for weakly-clustered embeddings
    (near-orthogonal random vectors hash almost uniformly). Defaults suit
    10^2-10^5 vectors; at cluster scale raise n_planes and WRITE the
    table partitioned by bucket so each query scans only its probe
    partitions."""
    import numpy as np
    from pyspark.sql.window import Window

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

    table = hyperplane_signature(df, vec_col, id_col, n_planes, dim, seed)

    rows = []
    for qid, v in query_vecs.items():
        vec = np.asarray(v, dtype=np.float64)
        bucket = 0
        for i in range(n_planes):
            if float(planes[i] @ vec) >= 0:
                bucket |= 1 << i
        probes = {bucket}
        if multiprobe >= 1:
            for i in range(n_planes):
                probes.add(bucket ^ (1 << i))
        if multiprobe >= 2:
            for i in range(n_planes):
                for j in range(i + 1, n_planes):
                    probes.add(bucket ^ (1 << i) ^ (1 << j))
        for p in sorted(probes):
            rows.append((qid, int(p), [float(x) for x in v]))
    qdf = df.sparkSession.createDataFrame(
        rows, "qid string, bucket long, qvec array<double>"
    )
    joined = table.join(F.broadcast(qdf), "bucket").select(
        "qid",
        "id",
        (_dot(F.col("vec"), F.col("qvec")) / (_norm(F.col("vec")) * _norm(F.col("qvec")))).alias("cosine"),
    )
    # rank by the ROUNDED cosine: boundary-stable cross-engine (the DuckDB
    # oracle in entry_queries orders by the same rounded key)
    joined = joined.withColumn("cosine", F.round("cosine", 6))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "id", "cosine")
        .orderBy("qid", F.desc("cosine"), F.asc("id"))
    )
