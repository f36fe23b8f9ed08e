"""Per-stage scaling decomposition for the index build (2 vs 8 cores).

Times three nested prefixes of the postings pipeline on the SAME corpus
at two parallelism levels, interleaved (one pair per iteration), so the
scaling efficiency of each pipeline segment is separable:

  tokenize : regexp_extract_all + explode + count  (pure JVM codegen)
  tf-agg   : + groupBy(term, doc, dl).count        (hash agg, map-side)
  full     : + group arrays + Arrow encode + parquet write (the boundary)

Usage: python tools/bench_stages.py [n_docs] [iters] [n_small]
Prints one JSON line per iteration and a summary.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

STAGE_SNIPPET = r"""
import json, os, shutil, sys, time
from esbulk_spark.session import get_spark
from esbulk_spark.config import IndexConfig
from esbulk_spark.functions.analyzer import tokens_col
from esbulk_spark.plans.build import build_index
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); tmp = sys.argv[3]
spark = get_spark(cpus=cpus, shuffle_partitions=max(32, cpus))
spark.sparkContext.setLogLevel("ERROR")
corpus_dir = f"{tmp}/esbulk_bench_corpus2k_{n_docs}"
if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
    from esbulk_spark.corpus import synth_corpus
    synth_corpus(spark, n_docs, seed=42).write.mode("overwrite").parquet(corpus_dir)
corpus = spark.read.parquet(corpus_dir)

# warmup (JIT) on a slice
corpus.limit(3000).select(F.explode(tokens_col("content")).alias("t")).groupBy("t").count().count()

out = {"cpus": cpus}
toks = corpus.select(F.xxhash64("repo", "path", "commit").alias("doc_id"),
                     tokens_col("content").alias("__toks"))
t0 = time.monotonic()
toks.select(F.explode("__toks").alias("term")).count()
out["tokenize_sec"] = round(time.monotonic() - t0, 3)

tf = toks.select("doc_id", F.size("__toks").alias("dl"), F.explode("__toks").alias("term")) \
         .groupBy("term", "doc_id", "dl").agg(F.count(F.lit(1)).alias("tf"))
t0 = time.monotonic()
tf.count()
out["tfagg_sec"] = round(time.monotonic() - t0, 3)

idx = f"{tmp}/esbulk_stage_idx_{cpus}_{n_docs}"
shutil.rmtree(idx, ignore_errors=True)
t0 = time.monotonic()
build_index(spark, corpus, IndexConfig(index_dir=idx, n_buckets=32, n_shards=32),
            input_sig=f"stages{n_docs}")
out["full_build_sec"] = round(time.monotonic() - t0, 3)
shutil.rmtree(idx, ignore_errors=True)
print(json.dumps(out))
spark.stop()
"""


def run_leg(cpus: int, n_docs: int, tmpdir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", STAGE_SNIPPET, str(cpus), str(n_docs), tmpdir],
        capture_output=True, text=True, timeout=2400,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    tmpdir = "/dev/shm/bench"
    os.makedirs(tmpdir, exist_ok=True)
    n_big = 4 * n_small
    effs: dict[str, list[float]] = {"tokenize_sec": [], "tfagg_sec": [], "full_build_sec": []}
    pairs = []
    for it in range(iters):
        small = run_leg(n_small, n_docs, tmpdir)
        big = run_leg(n_big, n_docs, tmpdir)
        pairs.append((small, big))
        row = {"iter": it}
        for key in effs:
            eff = small[key] / big[key] / 4.0
            effs[key].append(eff)
            row[key.replace("_sec", "_eff")] = round(eff, 2)
        print(json.dumps({"small": small, "big": big, **row}), file=sys.stderr)
    summary = {
        "n_docs": n_docs, "window": f"{n_small}->{n_big}",
        "median_eff": {k.replace("_sec", ""): round(statistics.median(v), 2) for k, v in effs.items()},
        "pairs": pairs,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
