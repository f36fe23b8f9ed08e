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
