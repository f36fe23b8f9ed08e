"""Rank-identity hardening: ties and randomized corpora.

The hard parts list (SURVEY.md §7): rank-identical scores under ties and
equal block maxes. Duplicate documents produce bit-equal BM25 scores;
the pruned path must keep them all and tie-break by doc_id exactly like
the oracle."""

import pytest
from pyspark.sql import functions as F

from esbulk_spark.config import IndexConfig
from esbulk_spark.plans.build import build_index
from esbulk_spark.plans.reader import IndexReader
from esbulk_spark.plans.score import bm25_fullscan


def _check_queries(spark, docs, reader, queries, k=10):
    for q in queries:
        oracle = [
            (r.doc_id, round(r.score, 6))
            for r in bm25_fullscan(docs, q, text_col="content", k=k).collect()
        ]
        wand = [(r.doc_id, round(r.score, 6)) for r in reader.search(q, k=k).collect()]
        full = [
            (r.doc_id, round(r.score, 6))
            for r in reader.search(q, k=k, prune=False).collect()
        ]
        assert oracle == wand == full, q


def test_tied_scores_break_by_doc_id(spark, tmp_path):
    """Many identical docs -> identical scores -> top-k must be the k
    smallest doc_ids among the tied, in both paths."""
    rows = (
        [(f"r/{i}", f"p{i}", f"c{i}", "py", "alpha beta gamma") for i in range(20)]
        + [(f"r/{i}", f"p{i}", f"c{i}", "py", "alpha delta") for i in range(20, 30)]
        + [(f"r/{i}", f"p{i}", f"c{i}", "py", "unrelated words here") for i in range(30, 40)]
    )
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path / "idx")
    cfg = IndexConfig(index_dir=d, n_buckets=4, n_shards=3, chunk_cap=8, block_size=4)
    build_index(spark, docs, cfg, input_sig="ties")
    r = IndexReader(spark, d)
    built_docs = r.docs()
    _check_queries(spark, built_docs, r, ["alpha", "alpha beta", "gamma delta", "beta"])
    # explicit: with 20 identical docs, top-10 for "beta" = 10 smallest ids
    res = [x.doc_id for x in r.search("beta", k=10).collect()]
    assert res == sorted(res) and len(res) == 10


@pytest.mark.parametrize("seed", [101, 202])
def test_fuzz_rank_identity_random_corpus(spark, tmp_path, seed):
    """Randomized corpora with tiny blocks/chunks (to force many block
    boundaries and prune decisions) must stay rank-identical."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(120):
        n = rng.randint(1, 60)
        # zipf-ish: low-index words hot
        words = [vocab[min(int(rng.expovariate(0.12)), 49)] for _ in range(n)]
        rows.append((f"r{i % 5}", f"p{i}", f"c{i}", "py", " ".join(words)))
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path / f"idx{seed}")
    cfg = IndexConfig(index_dir=d, n_buckets=4, n_shards=5, chunk_cap=16, block_size=4)
    build_index(spark, docs, cfg, input_sig=f"fuzz{seed}")
    r = IndexReader(spark, d)
    built_docs = r.docs()
    queries = [
        "w0", "w1 w2", "w0 w5 w9", "w49", "w0 w49",
        " ".join(f"w{rng.randint(0, 49)}" for _ in range(4)),
        " ".join(f"w{rng.randint(0, 49)}" for _ in range(4)),
    ]
    _check_queries(spark, built_docs, r, queries, k=15)


def test_driver_and_distributed_paths_rank_identical(spark, corpus, tmp_path):
    """search() has two physical plans behind one contract: driver-side
    scoring (small queries, one scan stage) and the distributed
    per-shard plan (past driver_score_max). Force each and assert
    identical results vs the full-scan oracle."""
    d = str(tmp_path / "idx_paths")
    cfg = IndexConfig(index_dir=d, n_buckets=8, n_shards=4, chunk_cap=256)
    build_index(spark, corpus, cfg, input_sig="paths150")
    r = IndexReader(spark, d)
    docs = r.docs()
    for q in ("getUserName", "flushBuffer retry score", "parse token"):
        oracle = [
            (x.doc_id, round(x.score, 6))
            for x in bm25_fullscan(docs, q, text_col="content").collect()
        ]
        r.driver_score_max = 2_000_000
        drv = [(x.doc_id, round(x.score, 6)) for x in r.search(q).collect()]
        r.dense_max = 0  # force the WAND sweep kernel (driver path)
        drv_wand = [(x.doc_id, round(x.score, 6)) for x in r.search(q).collect()]
        r.driver_score_max = 0  # force the distributed plan (WAND kernel)
        dist = [(x.doc_id, round(x.score, 6)) for x in r.search(q).collect()]
        r.dense_max = None  # distributed plan, dense kernel
        dist_dense = [(x.doc_id, round(x.score, 6)) for x in r.search(q).collect()]
        resp = r.search_response(q, k=10, with_source=False)
        rows_api = r.search_rows(q, k=10, round_to=6)
        r.driver_score_max = 2_000_000
        assert oracle == drv == drv_wand == dist == dist_dense, q
        assert [h["_id"] for h in resp["hits"]["hits"]] == [d0 for d0, _ in oracle]
        assert rows_api == oracle


def test_phrase_fuzz_vs_python_reference(spark, tmp_path):
    """Property fuzz: phrase matching on random small docs must agree
    with a brute-force pure-Python scan of the ANALYZED token streams
    (doc set, per-doc phrase frequency)."""
    import random

    from esbulk_spark.config import IndexConfig
    from esbulk_spark.functions.analyzer import tokenize_text
    from esbulk_spark.plans.build import build_index

    rng = random.Random(7)
    vocab = ["merge", "sort", "scan", "join", "hash", "filter", "agg"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "uid long, content string")
    d = str(tmp_path / "idx_fuzz_ph")
    cfg = IndexConfig(index_dir=d, id_col="uid", n_buckets=4, n_shards=3,
                      store_positions=True)
    build_index(spark, docs, cfg, input_sig="fz")
    r = IndexReader(spark, d)

    def brute(phrase):
        toks = phrase.split()
        out = {}
        for uid, text in rows:
            t = tokenize_text(text)
            n = sum(
                1
                for i in range(len(t) - len(toks) + 1)
                if t[i : i + len(toks)] == toks
            )
            if n:
                out[uid] = n
        return out

    for phrase in ["merge sort", "sort sort", "hash filter agg", "scan scan scan"]:
        want = brute(phrase)
        got = {
            x.doc_id: x.phrase_freq
            for x in r.search_phrase(phrase, k=1000).collect()
        }
        assert got == want, phrase
