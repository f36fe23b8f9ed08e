"""Analyzer determinism (SURVEY.md B1, §5 test plan item 1).

The analyzer is the single highest-risk determinism dependency: index and
query must share it byte-for-byte, and the DuckDB oracle must reproduce it."""

import duckdb
import pytest

from esbulk_spark.functions.analyzer import (
    MAX_TOKEN_LEN,
    STOPWORDS,
    analyze_query,
    duckdb_tokens_sql,
    tokenize_text,
    tokens_col,
)

GOLDENS = [
    ("parseHTTPResponse", ["parse", "http", "response"]),
    ("snake_case_ident", ["snake", "case", "ident"]),
    ("getUserName2X", ["get", "user", "name2", "x"]),
    ("camelCase mixedUP_and_down", ["camel", "case", "mixed", "up", "down"]),
    ("the a of In THE", []),  # stopword-only
    ("", []),
    (None, []),
    ("x" * (MAX_TOKEN_LEN + 1) + " ok", ["ok"]),  # overlong dropped
    ("héllo wörld", ["h", "llo", "w", "rld"]),  # non-ASCII are separators
    ("a1B2c3", ["a1", "b2c3"]),
    ("HTTPServer IOError", ["http", "server", "io", "error"]),
    ("return self.value;", ["return", "self", "value"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_tokenize_goldens(text, expected):
    assert tokenize_text(text) == expected


def test_analyze_query_dedup_sorted():
    assert analyze_query("foo bar foo BAR baz") == ["bar", "baz", "foo"]


def test_spark_native_matches_python(spark, corpus):
    from pyspark.sql import functions as F

    rows = corpus.select("content", tokens_col("content").alias("toks")).collect()
    assert rows
    for r in rows:
        assert list(r.toks) == tokenize_text(r.content)


def test_duckdb_sql_matches_python():
    con = duckdb.connect()
    texts = [g[0] for g in GOLDENS if g[0]] + ["MergeIndexBlock47 retry_count_3"]
    for t in texts:
        got = con.execute(
            f"SELECT {duckdb_tokens_sql('?')}", [t]
        ).fetchone()[0]
        assert got == tokenize_text(t), t


def test_fast_path_equals_reference_pipeline():
    """The findall fast path must match the sub/split spec exactly."""
    import random
    import string

    from esbulk_spark.functions.analyzer import tokenize_text_reference

    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "_ .-{}();\n" + "é漢"
    for _ in range(5000):
        s = "".join(rng.choices(alphabet, k=rng.randint(0, 150)))
        assert tokenize_text(s) == tokenize_text_reference(s), repr(s)
    for s, _ in GOLDENS:
        assert tokenize_text(s) == tokenize_text_reference(s)


def test_fast_catalyst_rendering_equals_spec_rendering(spark):
    """tokens_col (single-pass regexp_extract_all) must match
    tokens_col_spec (the verbatim two-replace + split pipeline) on a
    fuzzed vocabulary INCLUDING multi-byte/boundary cases — the two Java
    regex paths have to agree everywhere, not just on the corpus."""
    import random
    import string

    from pyspark.sql import functions as F

    from esbulk_spark.functions.analyzer import tokens_col_spec

    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + "_ .-{}();\n" + "éÄ漢🎉"
    texts = [
        "".join(rng.choices(alphabet, k=rng.randint(0, 200))) for _ in range(3000)
    ] + [g[0] for g in GOLDENS if g[0] is not None]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    bad = df.select(
        "s",
        tokens_col("s").alias("fast"),
        tokens_col_spec("s").alias("spec"),
    ).filter(F.col("fast") != F.col("spec"))
    rows = bad.collect()
    assert not rows, rows[:3]
    # and both must match the Python rendering
    sample = df.limit(500).select("s", tokens_col("s").alias("fast")).collect()
    for r in sample:
        assert list(r.fast) == tokenize_text(r.s), repr(r.s)


def test_stopwords_are_lowercase_ascii():
    for w in STOPWORDS:
        assert w == w.lower() and w.isascii()


# ---------------------------------------------------------------- stemmer


STEM_GOLDENS = [
    ("tables", "table"), ("queries", "query"), ("values", "value"),
    ("gas", "gas"), ("class", "class"), ("bus", "bus"),
    ("boxes", "boxe"),          # weak stemmer: -es drops only the s
    ("goes", "goes"),           # -oes exception is terminal
    ("trees", "trees"),         # -ees exception is terminal
    ("movies", "movy"),         # S-stemmer is aggressive on -ies
    ("eies", "eies"), ("aies", "aies"),
    ("ies", "y"), ("as", "as"), ("s", "s"), ("", ""),
    ("cats", "cat"), ("axes", "axe"), ("dogs", "dog"),
]


def test_stem_goldens():
    from esbulk_spark.functions.analyzer import stem_s

    for w, want in STEM_GOLDENS:
        assert stem_s(w) == want, w


def test_stem_catalyst_matches_python(spark):
    import random
    import string

    from pyspark.sql import functions as F

    from esbulk_spark.functions.analyzer import stem_s, stem_s_col

    rng = random.Random(11)
    words = [w for w, _ in STEM_GOLDENS if w]
    words += ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 12)))
              + rng.choice(["", "s", "es", "ies", "ss", "us", "oes"])
              for _ in range(300)]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = [r.s for r in df.select(stem_s_col(F.col("w")).alias("s")).collect()]
    assert got == [stem_s(w) for w in words]


def test_stem_duckdb_matches_python():
    import duckdb as _dd

    from esbulk_spark.functions.analyzer import duckdb_stem_sql, stem_s

    con = _dd.connect()
    for w, want in STEM_GOLDENS:
        # the rendering repeats its operand; inline a literal, not a `?`
        got = con.execute(f"SELECT {duckdb_stem_sql(repr(w))}").fetchone()[0]
        assert got == stem_s(w) == want, w
