"""Segment merge (SURVEY.md B7).

The reference delegates segment merging to Elasticsearch/Lucene and only
triggers the commit point (`_flush`, /root/reference/administration.go:32-48,
invoked run.go:256). Here segments are INDEPENDENT INDEX DIRECTORIES
built over disjoint doc-id ranges (e.g. per ingest wave, or the
incremental batches of streaming/); merging produces one index that is
byte-identical to a single-pass build over the union.

Correctness subtlety: per-block max_tfnorm bakes in the GLOBAL avgdl at
build time, and avgdl changes when segments merge. The raw tf/dl streams
are stored per posting, so the merge decodes (term, doc_id, tf, dl) rows
from every segment and re-runs the standard postings/dictionary/stats
stages with the merged statistics — block metadata comes out right by
construction. (A metadata-only rewrite that keeps blobs and recomputes
just the max columns is the planned optimization; re-encode is the
simple provably-identical baseline.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esbulk_spark.config import IndexConfig
from esbulk_spark.plans.build import build_index


def segment_tf_rows(spark: SparkSession, index_dir: str) -> DataFrame:
    """Decode one segment's postings back to (doc_id, term, tf, dl) rows
    plus the per-doc sentinel rows (from norms) — the exact shape of the
    tf stage, so the standard build stages can re-run on the union."""
    import numpy as np
    import pandas as pd

    from esbulk_spark.functions.codec import delta_decode, varint_decode

    posts = spark.read.parquet(os.path.join(index_dir, "postings"))

    def decode(batches):
        for pdf in batches:
            outs = []
            for _, r in pdf.iterrows():
                ids = delta_decode(varint_decode(r["blob_ids"])).astype(np.int64)
                tfs = varint_decode(r["blob_tfs"]).astype(np.int32)
                dls = varint_decode(r["blob_dls"]).astype(np.int32)
                outs.append(
                    pd.DataFrame(
                        {"doc_id": ids, "term": r["term"], "tf": tfs, "dl": dls}
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"doc_id": [], "term": [], "tf": [], "dl": []}
            )

    body = posts.mapInPandas(decode, "doc_id long, term string, tf int, dl int")
    sentinels = (
        spark.read.parquet(os.path.join(index_dir, "norms"))
        .select(
            "doc_id",
            F.lit(None).cast("string").alias("term"),
            F.lit(0).cast("int").alias("tf"),
            F.col("dl").cast("int").alias("dl"),
        )
    )
    return body.unionByName(sentinels)


def merge_segments(
    spark: SparkSession,
    segment_dirs: list[str],
    out_cfg: IndexConfig,
) -> dict:
    """Merge segment indexes into one index at out_cfg.index_dir.

    Doc ids must be globally unique across segments (disjoint ranges —
    the incremental-ingest contract). The merged docs table is the
    union; tf rows are decoded from segment postings and re-staged, so
    tokenization does NOT re-run (contents are not re-analyzed)."""
    docs = None
    for d in segment_dirs:
        seg_docs = spark.read.parquet(os.path.join(d, "docs"))
        docs = seg_docs if docs is None else docs.unionByName(seg_docs)

    tf = None
    for d in segment_dirs:
        rows = segment_tf_rows(spark, d)
        tf = rows if tf is None else tf.unionByName(rows)

    # re-run the standard build with the pre-computed tf rows injected:
    # write docs + tf staging in the layout build_index expects, then let
    # it resume from the stats stage onward.
    import shutil

    from esbulk_spark.plans.build import _atomic_write
    from esbulk_spark.plans.checkpoint import Manifest
    import math

    out = out_cfg.index_dir
    fp = out_cfg.fingerprint("merge:" + "|".join(sorted(segment_dirs)))
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    man = Manifest(out, fp)

    _atomic_write(docs, os.path.join(out, "docs"))
    n_docs = spark.read.parquet(os.path.join(out, "docs")).count()
    man.record("docs", rows=n_docs)

    n_shards = out_cfg.n_shards or max(1, math.ceil(n_docs / out_cfg.target_shard_docs))
    shard_size = math.ceil(n_docs / n_shards) if n_docs else 1
    tf = tf.withColumn("shard", (F.col("doc_id") / F.lit(shard_size)).cast("int"))
    _atomic_write(tf, os.path.join(out, "tf"))
    man.record("tf")

    # remaining stages (stats/norms/dictionary/postings) run inside
    # build_index, which sees docs+tf done and resumes
    dummy_docs = spark.read.parquet(os.path.join(out, "docs"))
    return build_index(spark, dummy_docs, out_cfg, input_sig="merge:" + "|".join(sorted(segment_dirs)))
