"""query_string mini-language: parser units + execution semantics
against the first-class search surfaces (search/search_bool/
search_phrase/search_prefix)."""

import pytest

from esbulk_spark.plans.reader import IndexReader
from esbulk_spark.plans.querystring import (
    Bool,
    Pattern,
    Phrase,
    QueryStringError,
    Term,
    parse_query_string,
)


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


# ----------------------------------------------------------- parser


def test_parse_precedence_and_shapes():
    n = parse_query_string("a OR b AND c")
    assert isinstance(n, Bool) and len(n.should) == 2  # AND binds tighter
    assert isinstance(n.should[1], Bool) and len(n.should[1].must) == 2
    n = parse_query_string("(a OR b) AND c")
    assert len(n.must) == 2 and isinstance(n.must[0], Bool)


def test_parse_modifiers_fold_to_bool():
    n = parse_query_string("+a b -c")
    assert [t.text for t in n.must] == ["a"]
    assert [t.text for t in n.should] == ["b"]
    assert [t.text for t in n.must_not] == ["c"]
    # NOT is the -'s keyword twin
    assert parse_query_string("b NOT c").must_not[0].text == "c"


def test_parse_phrase_slop_pattern_field():
    n = parse_query_string('"a b"~3')
    assert isinstance(n, Phrase) and n.slop == 3
    assert isinstance(parse_query_string('"a b"'), Phrase)
    assert isinstance(parse_query_string("pre*"), Pattern)
    assert isinstance(parse_query_string("w?ld"), Pattern)
    assert parse_query_string("text:x", default_field="text").text == "x"
    with pytest.raises(QueryStringError):
        parse_query_string("other:x", default_field="text")


def test_parse_default_operator_and():
    n = parse_query_string("a b", default_operator="AND")
    assert [t.text for t in n.must] == ["a", "b"] and n.should == []


@pytest.mark.parametrize("bad", ["", "AND", "(a", "a)", '"unclosed'])
def test_parse_rejects(bad):
    with pytest.raises(QueryStringError):
        parse_query_string(bad)


# ----------------------------------------------------------- execution


def _ids(df):
    return [r.doc_id for r in df.collect()]


def test_qs_equals_first_class_surfaces(reader):
    """Each single-construct query_string must equal its dedicated
    surface exactly (same docs, same scores)."""
    rows = lambda df: [(r.doc_id, round(r.score, 6)) for r in df.collect()]
    assert rows(reader.search_query_string("flushBuffer retry")) == rows(
        reader.search("flushBuffer retry")
    )
    assert rows(reader.search_query_string("flushBuffer AND retry")) == rows(
        reader.search_bool(must=["flushBuffer", "retry"])
    )
    assert rows(reader.search_query_string("flushBuffer -retry")) == rows(
        reader.search_bool(must=["flushBuffer"], must_not=["retry"])
    )
    assert rows(reader.search_query_string("get*")) == rows(
        reader.search_prefix("get")
    )


def test_qs_pure_negative_raises(reader):
    with pytest.raises(QueryStringError):
        reader.search_query_string("-flushBuffer").collect()


def test_qs_absent_term_conjunction_empty(reader):
    assert _ids(reader.search_query_string("flushBuffer AND zzznothere")) == []
    # absent OR-branch degrades to the present branch
    assert _ids(reader.search_query_string("flushBuffer OR zzznothere")) == _ids(
        reader.search("flushBuffer")
    )
