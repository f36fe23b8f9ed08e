"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema = BASELINE.json input_hint: (repo, path, commit, lang, content).
Mirrors the reference's generated fixture approach
(/root/reference/fixtures/gen.py:1-3 -> fixtures/v10k.jsonl, the golden
10k-doc workload of run_test.go:270-277), scaled up and code-shaped:
identifiers are drawn from a Zipf-distributed pool so some terms are HOT
(exercising posting-list skew / salting) and mix camelCase + snake_case
(exercising the analyzer).

Generation is distributed (mapInPandas over spark.range) and seeded per
document id, so the corpus is byte-identical regardless of parallelism,
partition count, or scale factor prefix — doc i is the same at n=500 and
n=50000.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_EXTS = [("py", "python"), ("go", "go"), ("java", "java"), ("rs", "rust"), ("js", "javascript")]
_KEYWORDS = ["def", "func", "return", "if", "for", "class", "import", "while", "else", "var"]
_MODULES = ["core", "util", "net", "index", "query", "store", "auth", "api"]

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"
SORT_KEYS = ("repo", "path", "commit")  # total order for doc-id assignment


def _ident_pool(seed: int = 42, size: int = 2000) -> list[str]:
    """Deterministic identifier pool: half camelCase, half snake_case."""
    import numpy as np

    rng = np.random.RandomState(seed)
    heads = ["get", "set", "parse", "build", "read", "write", "merge", "scan",
             "flush", "index", "search", "score", "token", "batch", "retry"]
    tails = ["user", "name", "doc", "term", "list", "node", "block", "shard",
             "count", "value", "buffer", "client", "server", "config", "result"]
    pool = []
    for i in range(size):
        a = heads[int(rng.randint(len(heads)))]
        b = tails[int(rng.randint(len(tails)))]
        c = int(rng.randint(100))
        if i % 2 == 0:
            pool.append(f"{a}{b.capitalize()}{c}")
        else:
            pool.append(f"{a}_{b}_{c}")
    return pool


def _doc_content(doc_i: int, seed: int, pool: list[str]) -> str:
    import numpy as np

    rng = np.random.RandomState((seed * 1_000_003 + doc_i) % (2**31 - 1))
    # 8..49 lines of ~70 B -> ~2.0 KB avg: the reference's 2 KB-doc
    # headline workload (measurements.csv:2), so docs/s is like-for-like
    n_lines = 8 + int(rng.randint(42))
    # Zipf over the pool: rank-skewed identifier frequency (hot terms)
    ranks = rng.zipf(1.3, size=n_lines * 6) % len(pool)
    lines = []
    ri = 0
    for li in range(n_lines):
        kw = _KEYWORDS[int(rng.randint(len(_KEYWORDS)))]
        idents = [pool[int(ranks[ri + j])] for j in range(4)]
        ri += 4
        lit = int(rng.randint(10_000))
        lines.append(f"{kw} {idents[0]}({idents[1]}, {idents[2]}) {{ {idents[3]} = {lit}; }}")
    return "\n".join(lines)


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42, n_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` synthetic source files."""
    import pandas as pd

    if n_partitions is None:
        n_partitions = max(8, min(256, n_docs // 500 or 1))
    pool = _ident_pool(seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].values:
                i = int(i)
                ext, lang = _EXTS[i % len(_EXTS)]
                repo = f"org{i % 7}/repo{i % 23}"
                module = _MODULES[(i // 5) % len(_MODULES)]
                path = f"src/{module}/file_{i}.{ext}"
                commit = hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest()[:12]
                rows.append((repo, path, commit, lang, _doc_content(i, seed, pool)))
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(n_docs, numPartitions=n_partitions).mapInPandas(gen, CORPUS_SCHEMA)
