"""query_string mini-language: parser units + execution semantics
against the first-class search surfaces (search/search_bool/
search_phrase/search_prefix)."""

import pytest

from esbulk_spark.plans.reader import IndexReader
from esbulk_spark.plans.querystring import (
    Bool,
    FieldTerm,
    Pattern,
    Phrase,
    QueryStringError,
    Range,
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
    # a non-text field parses to an exact keyword match; the field's
    # existence is validated at compile time against the docs schema
    n = parse_query_string("lang:go", default_field="text")
    assert isinstance(n, FieldTerm) and (n.fld, n.value) == ("lang", "go")


def test_parse_ranges():
    n = parse_query_string("dl:[10 TO 200]")
    assert isinstance(n, Range)
    assert (n.fld, n.lo, n.hi, n.incl_lo, n.incl_hi) == ("dl", 10, 200, True, True)
    n = parse_query_string("dl:{1.5 TO 2.5}")
    assert (n.lo, n.hi, n.incl_lo, n.incl_hi) == (1.5, 2.5, False, False)
    n = parse_query_string("path:[aaa TO zzz}")
    assert (n.lo, n.hi, n.incl_lo, n.incl_hi) == ("aaa", "zzz", True, False)
    n = parse_query_string("dl:[* TO 50]")
    assert n.lo is None and n.hi == 50
    assert parse_query_string("dl:>=7") == Range("dl", 7, None, True, True)
    assert parse_query_string("dl:>7") == Range("dl", 7, None, False, True)
    assert parse_query_string("dl:<=7") == Range("dl", None, 7, True, True)
    assert parse_query_string("dl:<7") == Range("dl", None, 7, True, False)
    # a range folds into bool clauses like any other atom
    n = parse_query_string("+merge +dl:[10 TO 200]")
    assert isinstance(n.must[1], Range)


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


def test_range_and_field_queries(reader):
    docs = reader.docs()
    # pure range: constant score 1.0, ties -> canonical doc_id order
    expect = sorted(
        r.doc_id
        for r in docs.filter("dl >= 120 and dl <= 200").select("doc_id").collect()
    )
    got = reader.search_range("dl", gte=120, lte=200, k=100_000)
    assert _ids(got) == expect and expect
    assert all(r.score == 1.0 for r in got.collect())
    # exclusive bounds through query_string brackets
    qs = reader.search_query_string("dl:{120 TO 200}", k=100_000)
    assert _ids(qs) == sorted(
        r.doc_id
        for r in docs.filter("dl > 120 and dl < 200").select("doc_id").collect()
    )
    # comparison shorthand AND open bound compose like any bool clauses
    assert _ids(
        reader.search_query_string("dl:>=120 AND dl:[* TO 200]", k=100_000)
    ) == expect
    # keyword-field term + scored term == filter context shifted by the
    # constant 1.0 (order-preserving)
    rows = lambda df: [(r.doc_id, round(r.score, 6)) for r in df.collect()]
    mixed = rows(reader.search_query_string("+flushBuffer +lang:go", k=10))
    filt = rows(reader.search_bool(must=["flushBuffer"], filter="lang = 'go'", k=10))
    assert mixed == [(d, round(s + 1.0, 6)) for d, s in filt] and mixed
    # unknown field is a compile-time error against the docs schema
    with pytest.raises(QueryStringError):
        reader.search_query_string("nope:[1 TO 2]").collect()
    with pytest.raises(QueryStringError):
        reader.search_range("nope", gte=1)


def test_qs_absent_term_conjunction_empty(reader):
    assert _ids(reader.search_query_string("flushBuffer AND zzznothere")) == []
    # absent OR-branch degrades to the present branch
    assert _ids(reader.search_query_string("flushBuffer OR zzznothere")) == _ids(
        reader.search("flushBuffer")
    )


def test_exists_query(reader, spark):
    """ES `_exists_:field`: constant-score filter on non-null stored
    columns; composes with scored clauses like any filter-context
    leaf, and validates the field at compile time."""
    from esbulk_spark.plans.querystring import Exists

    n = parse_query_string("_exists_:lang")
    assert isinstance(n, Exists) and n.fld == "lang"
    docs = reader.docs()
    expect = sorted(
        r.doc_id
        for r in docs.filter("lang is not null").select("doc_id").collect()
    )
    got = reader.search_query_string("_exists_:lang", k=100_000)
    assert sorted(r.doc_id for r in got.collect()) == expect and expect
    assert all(r.score == 1.0 for r in got.collect())
    # composition: +term +_exists_:lang == term filtered to non-null lang
    rows = lambda df: [(r.doc_id, round(r.score, 6)) for r in df.collect()]
    mixed = rows(reader.search_query_string("+flushBuffer +_exists_:lang", k=10))
    filt = rows(
        reader.search_bool(must=["flushBuffer"], filter="lang is not null", k=10)
    )
    assert mixed == [(d, round(s + 1.0, 6)) for d, s in filt] and mixed
    with pytest.raises(QueryStringError):
        reader.search_query_string("_exists_:nope").collect()


def test_parser_fuzz_never_crashes():
    """Arbitrary strings either parse to an AST or raise the typed
    QueryStringError — no other exception class escapes the parser."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.sampled_from(
                list("abcXYZ019 _.:*?~+-()[]{}\"'\\/<>=ANDORTN")
            ),
            min_size=0,
            max_size=40,
        )
    )
    def run(q):
        try:
            parse_query_string(q)
        except QueryStringError:
            pass

    run()
