"""Bit-parity of the pure-Python XXH64 with Spark's xxhash64 (seed 42).

Static bucket pruning (plans/reader.py:_buckets) computes term -> bucket
DRIVER-SIDE and inlines the ids as plan literals; the write path buckets
with F.xxhash64 (plans/build.py:bucket_col). A parity break silently
prunes to the wrong partition directory — a term's results vanish with
no error — so parity is asserted directly here over a fuzzed unicode
vocabulary, not just indirectly via the e2e search suite.
"""

import random
import string

import pytest
from pyspark.sql import functions as F

from esbulk_spark.functions.xxhash import spark_xxhash64_signed, term_bucket, xxh64


def _fuzz_strings(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    pools = [
        string.ascii_lowercase,
        string.ascii_letters + string.digits + "_-./",
        # multi-byte: latin-1 sup, CJK, emoji-plane and combining marks
        "äöüßéñç",
        "日本語中文한국어",
        "😀🎉🚀𝔘𝔫𝔦",
        "áê",  # combining accents
    ]
    out = []
    for i in range(n):
        pool = pools[i % len(pools)]
        ln = rng.choice([0, 1, 2, 3, 5, 8, 13, 21, 31, 32, 33, 63, 64, 100, 255])
        out.append("".join(rng.choice(pool) for _ in range(ln)))
    # fixed edge cases: empty, exact block-size boundaries of the XXH64
    # stripe (32B) and tail lanes (8/4/1B)
    out += ["", "a", "ab", "abc", "abcd", "x" * 7, "x" * 8, "x" * 9,
            "x" * 31, "x" * 32, "x" * 33, "y" * 64, "merge", "sort", "join"]
    return out


def test_xxh64_spark_parity(spark):
    vocab = list(dict.fromkeys(_fuzz_strings(10_000)))
    df = spark.createDataFrame([(s,) for s in vocab], "s string")
    got = {
        r["s"]: (r["h"], r["b"])
        for r in df.select(
            "s",
            F.xxhash64("s").alias("h"),
            F.pmod(F.xxhash64("s"), F.lit(16)).cast("int").alias("b"),
        ).collect()
    }
    assert len(got) == len(vocab)
    for s in vocab:
        h, b = got[s]
        assert spark_xxhash64_signed(s) == h, f"hash mismatch for {s!r}"
        assert term_bucket(s, 16) == b, f"bucket mismatch for {s!r}"


def test_xxh64_known_lane_paths():
    # exercise every internal lane combination of the implementation:
    # <32B (no stripe), >=32B (stripe), plus 8/4/1-byte tail mixes
    for n in [0, 1, 3, 4, 5, 7, 8, 9, 12, 15, 16, 31, 32, 40, 44, 45, 63, 64, 65]:
        data = bytes(range(n % 251)) * ((n // max(n % 251, 1)) + 1) if n else b""
        data = data[:n]
        h = xxh64(data, seed=42)
        assert 0 <= h < (1 << 64)
        # determinism
        assert xxh64(data, seed=42) == h
