"""Doc-id assignment (SURVEY.md B2): dense, deterministic, order-correct."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esbulk_spark.corpus import synth_corpus
from esbulk_spark.operators.docids import assign_doc_ids


def test_dense_and_order_matches_row_number(spark, corpus):
    got = assign_doc_ids(corpus, ("repo", "path", "commit"))
    w = Window.orderBy("repo", "path", "commit")
    expected = corpus.withColumn("rn", F.row_number().over(w) - 1)
    joined = got.join(expected, ["repo", "path", "commit"])
    assert joined.filter(F.col("doc_id") != F.col("rn")).count() == 0
    n = corpus.count()
    ids = [r.doc_id for r in got.select("doc_id").collect()]
    assert sorted(ids) == list(range(n))


def test_deterministic_across_partitioning(spark):
    a = assign_doc_ids(
        synth_corpus(spark, 120, seed=7, n_partitions=3), ("repo", "path", "commit")
    )
    b = assign_doc_ids(
        synth_corpus(spark, 120, seed=7, n_partitions=11), ("repo", "path", "commit")
    )
    ma = {r.commit: r.doc_id for r in a.select("commit", "doc_id").collect()}
    mb = {r.commit: r.doc_id for r in b.select("commit", "doc_id").collect()}
    assert ma == mb


def test_duplicate_keys_fall_back_to_unique_ids(spark):
    """ADVICE r3 (high): duplicate sort keys must NOT fan out the
    keys-only join-back — ids stay dense and unique via the full-row
    fallback; NULL keys must not be dropped (null-safe join)."""
    rows = [("a", 1), ("a", 2), ("b", 3), ("a", 4), (None, 5), (None, 6)]
    df = spark.createDataFrame(rows, "k string, v int")
    out = assign_doc_ids(df, ("k",)).collect()
    assert len(out) == len(rows)  # no fan-out, no dropped NULL-key rows
    assert sorted(r.doc_id for r in out) == list(range(len(rows)))


def test_null_keys_kept_on_unique_path(spark):
    """Unique keys incl. a NULL: the fast keys-only path must keep the
    NULL-key row (eqNullSafe join-back) and number it first."""
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), (None, 3), ("c", 4)], "k string, v int"
    )
    out = {r.v: r.doc_id for r in assign_doc_ids(df, ("k",)).collect()}
    assert sorted(out.values()) == [0, 1, 2, 3]
    assert out[3] == 0  # NULLs sort first in the range partitioning
