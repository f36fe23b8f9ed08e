"""NDJSON source parity (FIXTURES.md F3/F4; reference indexing.go:204-258,
run.go:301-311, extra/ok.jsonl + extra/broken.jsonl)."""

import pytest
from pyspark.sql import functions as F

from esbulk_spark.sources import ndjson


@pytest.fixture(scope="module")
def lines_file(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("ndj") / "docs.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"x": "doc-1", "db": "mysql"}',
                "",
                "   ",
                '{"a": {"b": 1}}',
                '{"a": {"b": 1}, "c": "a"}',
                "this is not json",
                '{"_id": "k7", "v": "x"}',
                '{"z": 1}',
            ]
        )
    )
    return str(p)


def test_linescan_and_blank_filter(spark, lines_file):
    lines = ndjson.read_ndjson_lines(spark, lines_file)
    assert lines.count() == 8
    assert ndjson.drop_blank(lines).count() == 6  # run.go:301-303


def test_skip_broken(spark, lines_file):
    lines = ndjson.drop_blank(ndjson.read_ndjson_lines(spark, lines_file))
    assert ndjson.skip_broken(lines).count() == 5  # run.go:304-311


def test_quarantine_split(spark, lines_file):
    lines = ndjson.drop_blank(ndjson.read_ndjson_lines(spark, lines_file))
    good, bad = ndjson.quarantine_broken(lines)
    assert good.count() == 5
    assert [r.value for r in bad.collect()] == ["this is not json"]


def test_id_spec_parsing():
    # indexing.go:212 — comma or space separated
    assert ndjson.parse_id_spec("a.b,c") == ["a.b", "c"]
    assert ndjson.parse_id_spec("a.b c") == ["a.b", "c"]
    assert ndjson.parse_id_spec(" x ") == ["x"]


@pytest.mark.parametrize(
    "doc,spec,expected",
    [
        ('{"x": "doc-1", "db": "mysql"}', "x", "doc-1"),      # simple
        ('{"a": {"b": 1}}', "a.b", "1"),                       # nested + number
        ('{"a": {"b": 1}, "c": "a"}', "a.b,c", "1a"),          # concat (comma)
        ('{"a": {"b": 1}, "c": "a"}', "a.b c", "1a"),          # concat (space)
        ('{"z": 1}', "x", None),                               # missing -> NULL
    ],
)
def test_extract_id_cases(spark, doc, spec, expected):
    # mirrors extractDocumentID cases, indexing.go:204-258 + README.md:184-225
    df = spark.createDataFrame([(doc,)], "value string")
    got = ndjson.extract_id(df, spec).collect()[0]["_extracted_id"]
    assert got == expected


def test_id_scrub(spark):
    # indexing.go:245-256: -id _id pulls the id then deletes the field
    df = spark.createDataFrame([('{"_id": "k7", "v": "x"}',)], "value string")
    with_id = ndjson.extract_id(df, "_id")
    scrubbed = ndjson.scrub_id_field(with_id)
    row = scrubbed.collect()[0]
    assert row["_extracted_id"] == "k7"
    assert "_id" not in row["value"]
    assert '"v":"x"' in row["value"].replace(" ", "")


def test_id_scrub_preserves_types(spark):
    # the scrub must delete ONLY _id: numbers stay numbers, nested
    # objects stay objects (a map<string,string> re-parse would coerce
    # both to strings) — reference semantics, indexing.go:245-256
    import json

    doc = '{"_id": "k7", "n": 1, "f": 2.5, "o": {"x": [1, 2]}, "b": true, "z": null}'
    df = spark.createDataFrame([(doc,)], "value string")
    out = json.loads(ndjson.scrub_id_field(df).collect()[0]["value"])
    assert out == {"n": 1, "f": 2.5, "o": {"x": [1, 2]}, "b": True, "z": None}
    # malformed lines pass through untouched
    bad = spark.createDataFrame([("{not json",)], "value string")
    assert ndjson.scrub_id_field(bad).collect()[0]["value"] == "{not json"


def test_bulk_actions(spark):
    # indexing.go:279-312 header synthesis
    df = spark.createDataFrame([('{"v": "0"}', "id0")], "value string, xid string")
    rows = ndjson.bulk_actions(df, "myidx", id_col="xid", op_type="index").collect()
    assert rows[0].action_line == '{"index": {"_index": "myidx", "_id": "id0"}}'
    assert rows[0].doc_line == '{"v": "0"}'
    rows = ndjson.bulk_actions(df, "myidx", op_type="create").collect()
    assert rows[0].action_line == '{"create": {"_index": "myidx"}}'


def test_reference_fixture_golden_count(spark, tmp_path):
    """The reference's golden workload: 10,000 generated docs, count
    verified after ingest (fixtures/gen.py, run_test.go:270-320)."""
    import json

    p = tmp_path / "v10k.jsonl"
    p.write_text("\n".join(json.dumps({"v": str(i)}) for i in range(10000)))
    lines = ndjson.skip_broken(
        ndjson.drop_blank(ndjson.read_ndjson_lines(spark, str(p)))
    )
    assert lines.count() == 10000
