"""Index build driver (SURVEY.md B2-B7; reference lifecycle run.go:90-367).

Spark-first dataflow, one shuffle per stage, every stage a materialized
checkpoint (plans/checkpoint.py):

  docs   : input -> [pipeline] -> doc_id assignment -> parquet
           (the DDL prologue analog: purge/create, run.go:160-198)
  tf     : one Arrow pass (mapInPandas) tokenize+count ->
           (doc_id, term, tf, dl) + per-doc sentinel rows, written
           partitioned by doc-range shard. THE big intermediate; no
           exploded raw-token table ever exists.
  stats  : N, avgdl, total postings (tiny aggregates) -> stats.json
  dict   : groupBy(term) -> (term, df, cf), partitioned by term bucket
  postings: groupBy(term, shard) -> applyInPandas chunk builder ->
           delta+varint blobs + per-block (last_doc, max_tfnorm, byte
           offsets), partitioned by term bucket.

Scale design:
  * doc-range shards bound every (term, shard) group — even a stopword
    term groups at most ``shard docs`` postings, so no single reducer
    blows up (the groupBy salt the north rule requires; skew ratio is
    recorded per stage in the manifest).
  * term-hash buckets give partition pruning at query time: a query
    touches only its terms' bucket directories.
  * per-block max_tfnorm (tf-normalization upper bound WITHOUT idf,
    which is a per-term constant applied at query time) enables
    block-max pruning; storing tf-norm rather than the full score means
    the dictionary df never has to be joined into the postings build.
  * dl is stored inline per posting (one varint), making chunks
    self-contained for scoring — no doc_id-keyed norms join at query
    time (norms at 10^12 docs would be a second big shuffle per query).
"""

from __future__ import annotations

import json
import math
import os
import shutil

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esbulk_spark.config import IndexConfig
from esbulk_spark.functions.analyzer import TF_SCHEMA, tf_map_in_pandas
from esbulk_spark.functions.codec import encode_postings, varint_encode_blocks
from esbulk_spark.operators.docids import assign_doc_ids
from esbulk_spark.plans.checkpoint import Manifest, StageTimer

POSTINGS_SCHEMA = (
    "term string, shard int, chunk int, min_doc long, max_doc long, n int, "
    "max_tfnorm double, blob_ids binary, blob_tfs binary, blob_dls binary, "
    "block_last array<long>, block_max_tfnorm array<double>, "
    "off_ids array<int>, off_tfs array<int>, off_dls array<int>"
)

STATS_FILE = "stats.json"


def bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def _tfnorm(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl.astype(np.float64) / avgdl)))


_CHUNK_COLS = [
    "term", "shard", "chunk", "min_doc", "max_doc", "n",
    "max_tfnorm", "blob_ids", "blob_tfs", "blob_dls",
    "block_last", "block_max_tfnorm", "off_ids", "off_tfs", "off_dls",
]


def _encode_group(term, shard, ids, tfs, dls, tfn, cap, bs, out_rows):
    """Encode one (term, shard) posting run (already doc_id-sorted)."""
    n = ids.size
    for ci, lo in enumerate(range(0, n, cap)):
        hi = min(lo + cap, n)
        cid, ctf, cdl, ctfn = ids[lo:hi], tfs[lo:hi], dls[lo:hi], tfn[lo:hi]
        blob_ids, off_ids, block_last = encode_postings(cid.astype(np.uint64), bs)
        blob_tfs, off_tfs = varint_encode_blocks(ctf.astype(np.uint64), bs)
        blob_dls, off_dls = varint_encode_blocks(cdl.astype(np.uint64), bs)
        n_blocks = len(off_ids)
        # block maxes without a python loop: pad to block multiple, reshape
        padded = np.full(n_blocks * bs, -np.inf)
        padded[: ctfn.size] = ctfn
        bmax = padded.reshape(n_blocks, bs).max(axis=1)
        out_rows.append(
            (
                term, int(shard), ci, int(cid[0]), int(cid[-1]), int(hi - lo),
                float(ctfn.max()), blob_ids, blob_tfs, blob_dls,
                block_last.astype(np.int64), bmax,
                off_ids.astype(np.int32), off_tfs.astype(np.int32),
                off_dls.astype(np.int32),
            )
        )


def make_chunk_builder(cfg: IndexConfig, avgdl: float):
    """mapInPandas partition builder over rows sorted by (term, shard, doc_id).

    A per-(term,shard) ``groupBy().applyInPandas`` pays one Python/Arrow
    round trip PER GROUP — ruinous with millions of tiny term groups.
    Instead the postings input is hash-repartitioned on (term, shard) and
    sorted within partitions; this builder streams the Arrow batches,
    detects group boundaries with numpy, and carries the (possibly
    incomplete) trailing group over to the next batch. One Python round
    trip per ~10k-row batch, vectorized encode per group."""
    import pandas as pd

    k1, b = cfg.k1, cfg.b
    cap, bs = cfg.chunk_cap, cfg.block_size

    def build(batches):
        pend = None  # (term_arr, shard_arr, id_arr, tf_arr, dl_arr) tail

        def emit(terms, shards, ids, tfs, dls, hold_tail: bool):
            nonlocal pend
            # boundaries where (term, shard) changes; rows already sorted
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
            )
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [terms.size]))
            if hold_tail:
                # last group may continue into the next Arrow batch
                pend = (
                    terms[starts[-1]:], shards[starts[-1]:], ids[starts[-1]:],
                    tfs[starts[-1]:], dls[starts[-1]:],
                )
                starts, ends = starts[:-1], ends[:-1]
            rows: list = []
            tfn_all = _tfnorm(tfs, dls, k1, b, avgdl)
            for s, e in zip(starts, ends):
                _encode_group(
                    terms[s], shards[s], ids[s:e], tfs[s:e], dls[s:e],
                    tfn_all[s:e], cap, bs, rows,
                )
            if rows:
                return pd.DataFrame(rows, columns=_CHUNK_COLS)
            return None

        for pdf in batches:
            terms = pdf["term"].values.astype(object)
            shards = pdf["shard"].values.astype(np.int64)
            ids = pdf["doc_id"].values.astype(np.int64)
            tfs = pdf["tf"].values.astype(np.int64)
            dls = pdf["dl"].values.astype(np.int64)
            if pend is not None:
                terms = np.concatenate((pend[0], terms))
                shards = np.concatenate((pend[1], shards))
                ids = np.concatenate((pend[2], ids))
                tfs = np.concatenate((pend[3], tfs))
                dls = np.concatenate((pend[4], dls))
                pend = None
            out = emit(terms, shards, ids, tfs, dls, hold_tail=True)
            if out is not None:
                yield out
        if pend is not None and pend[0].size:
            out = emit(*pend, hold_tail=False)
            if out is not None:
                yield out

    return build


def _atomic_write(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    tmp = path + ".__tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    cfg: IndexConfig,
    input_sig: str = "",
) -> dict:
    """Build (or resume) the full index table set under cfg.index_dir."""
    d = cfg.index_dir
    fp = cfg.fingerprint(input_sig)
    man = Manifest(d, fp)
    if cfg.overwrite and os.path.exists(d) and not _same_fingerprint(d, fp):
        shutil.rmtree(d)  # esbulk -purge (run.go:160-165)
    os.makedirs(d, exist_ok=True)
    man.load()

    if cfg.pipeline is not None:  # esbulk -p ingest pipeline (indexing.go:270-272)
        docs = cfg.pipeline(docs)

    # ---- stage: docs (ids + sha256 invariant column) ----
    docs_path = os.path.join(d, "docs")
    if not man.is_done("docs", docs_path):
        with StageTimer() as t:
            if cfg.id_col:
                with_ids = docs.withColumn("doc_id", F.col(cfg.id_col).cast("long"))
            else:
                with_ids = assign_doc_ids(docs, cfg.sort_keys)
            # content stays in the docs table: the tf stage reads it, and it
            # serves _source at query time. (At 10^12-file scale you would
            # point the tf stage at the source Iceberg table instead and keep
            # only content_sha here — the per-row invariant, BASELINE.json.)
            with_ids = with_ids.withColumn(
                "content_sha", F.sha2(F.col(cfg.text_col), 256)
            )
            _atomic_write(with_ids, docs_path)
        n_docs = spark.read.parquet(docs_path).count()
        man.record("docs", rows=n_docs, secs=t.secs)
    n_docs = spark.read.parquet(docs_path).count()

    n_shards = cfg.n_shards or max(1, math.ceil(n_docs / cfg.target_shard_docs))
    shard_size = math.ceil(n_docs / n_shards) if n_docs else 1

    # ---- stage: tf (single Arrow pass; sentinel rows carry dl) ----
    tf_path = os.path.join(d, "tf")
    if not man.is_done("tf", tf_path):
        with StageTimer() as t:
            dd = spark.read.parquet(docs_path)
            tf = dd.select("doc_id", cfg.text_col).mapInPandas(
                tf_map_in_pandas("doc_id", cfg.text_col), TF_SCHEMA
            )
            tf = tf.withColumn(
                "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int")
            )
            _atomic_write(tf, tf_path, partition_by=["shard"])
        man.record("tf", secs=t.secs)

    tf = spark.read.parquet(tf_path)
    postings_in = tf.filter(F.col("term").isNotNull())

    # ---- stage: stats (tiny aggregates -> stats.json) ----
    stats_path = os.path.join(d, STATS_FILE)
    if not man.is_done("stats", stats_path):
        with StageTimer() as t:
            agg = postings_in.agg(
                F.sum("tf").alias("total_tokens"),
                F.count(F.lit(1)).alias("total_postings"),
            ).collect()[0]
            total_tokens = int(agg["total_tokens"] or 0)
            total_postings = int(agg["total_postings"] or 0)
            avgdl = (total_tokens / n_docs) if n_docs else 1.0
            stats = {
                "n_docs": int(n_docs),
                "avgdl": avgdl,
                "total_tokens": total_tokens,
                "total_postings": total_postings,
                "k1": cfg.k1,
                "b": cfg.b,
                "analyzer": cfg.analyzer,
                "n_shards": int(n_shards),
                "shard_size": int(shard_size),
                "n_buckets": cfg.n_buckets,
                "chunk_cap": cfg.chunk_cap,
                "block_size": cfg.block_size,
                "fingerprint": fp,
            }
            with open(stats_path, "w") as f:
                json.dump(stats, f, indent=1)
        man.record("stats", secs=t.secs, **{k: v for k, v in stats.items() if k != "fingerprint"})
    stats = json.load(open(stats_path))

    # ---- stage: norms (doc_id, dl) — oracle/test support ----
    norms_path = os.path.join(d, "norms")
    if not man.is_done("norms", norms_path):
        with StageTimer() as t:
            norms = tf.filter(F.col("term").isNull()).select("doc_id", "dl")
            _atomic_write(norms, norms_path)
        man.record("norms", secs=t.secs)

    # ---- stage: dictionary (term, df, cf) by bucket ----
    dict_path = os.path.join(d, "dictionary")
    if not man.is_done("dictionary", dict_path):
        with StageTimer() as t:
            dictionary = (
                postings_in.groupBy("term")
                .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
                .withColumn("bucket", bucket_col(F.col("term"), cfg.n_buckets))
            )
            _atomic_write(dictionary, dict_path, partition_by=["bucket"])
        n_terms = spark.read.parquet(dict_path).count()
        man.record("dictionary", rows=n_terms, secs=t.secs)

    # ---- stage: postings chunks by bucket ----
    post_path = os.path.join(d, "postings")
    if not man.is_done("postings", post_path):
        with StageTimer() as t:
            chunks = (
                postings_in.select("term", "shard", "doc_id", "tf", "dl")
                .repartition(
                    int(spark.conf.get("spark.sql.shuffle.partitions")),
                    "term", "shard",
                )
                .sortWithinPartitions("term", "shard", "doc_id")
                .mapInPandas(make_chunk_builder(cfg, stats["avgdl"]), POSTINGS_SCHEMA)
                .withColumn("bucket", bucket_col(F.col("term"), cfg.n_buckets))
            )
            _atomic_write(chunks, post_path, partition_by=["bucket"])
        # skew metric: postings per (term,shard) group max vs mean
        pc = spark.read.parquet(post_path)
        srow = pc.agg(
            F.count(F.lit(1)).alias("chunks"),
            F.max("n").alias("max_chunk"),
            F.avg("n").alias("avg_chunk"),
        ).collect()[0]
        skew = float(srow["max_chunk"] / srow["avg_chunk"]) if srow["avg_chunk"] else 1.0
        man.record(
            "postings", secs=t.secs, chunks=int(srow["chunks"]),
            skew_ratio=skew,
            postings_per_sec=(stats["total_postings"] / t.secs if t.secs else 0),
        )
    return stats


def _same_fingerprint(index_dir: str, fp: str) -> bool:
    p = os.path.join(index_dir, STATS_FILE)
    try:
        return json.load(open(p)).get("fingerprint") == fp
    except Exception:
        # stats not yet written: trust the manifest fingerprints
        mp = os.path.join(index_dir, "manifest.jsonl")
        try:
            with open(mp) as f:
                return any(json.loads(x).get("fingerprint") == fp for x in f if x.strip())
        except Exception:
            return False
