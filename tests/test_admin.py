"""Index administration surface (plans/admin.py): aliases, snapshot /
restore, reindex, _cat — the ES cluster-metadata family around the data
path (reference parity: index create/delete run.go:160-175, doc-count
verification run_test.go:318-320)."""

import json
import os

import pytest

from esbulk_spark.config import IndexConfig
from esbulk_spark.plans import admin
from esbulk_spark.plans.build import build_index
from esbulk_spark.plans.reader import IndexReader


@pytest.fixture()
def registry(tmp_path):
    return str(tmp_path / "registry")


def test_alias_crud(registry, index_dir):
    admin.put_alias(registry, "live", index_dir)
    admin.put_alias(registry, "live", index_dir)  # idempotent
    assert admin.resolve_alias(registry, "live") == [os.path.abspath(index_dir)]
    # a literal index dir resolves to itself
    assert admin.resolve_alias(registry, index_dir) == [os.path.abspath(index_dir)]
    with pytest.raises(KeyError):
        admin.resolve_alias(registry, "nope")
    admin.delete_alias(registry, "live")
    with pytest.raises(KeyError):
        admin.resolve_alias(registry, "live")


def test_search_through_alias(spark, registry, index_dir):
    admin.put_alias(registry, "live", index_dir)
    direct = IndexReader(spark, index_dir).search("flushBuffer retry", k=5).collect()
    via = admin.search_alias(spark, registry, "live", "flushBuffer retry", k=5).collect()
    assert [(r.doc_id, r.score) for r in via] == [(r.doc_id, r.score) for r in direct]


def test_multi_index_alias_fans_out(spark, registry, index_dir, tmp_path):
    # second index over a different corpus slice
    from esbulk_spark.corpus import synth_corpus

    d2 = str(tmp_path / "idx2")
    cfg = IndexConfig(index_dir=d2, n_buckets=8, n_shards=2, chunk_cap=256)
    build_index(spark, synth_corpus(spark, 60, seed=7), cfg, input_sig="a60")
    admin.put_alias(registry, "all", index_dir)
    admin.put_alias(registry, "all", d2)
    out = admin.search_alias(spark, registry, "all", "return", k=5).collect()
    assert len(out) == 5
    assert {r._index for r in out} <= {os.path.basename(index_dir), "idx2"}


def test_snapshot_restore_roundtrip(spark, index_dir, tmp_path):
    snap = str(tmp_path / "snap")
    meta = admin.snapshot_index(index_dir, snap)
    assert "docs" in meta["tables"] and "postings" in meta["tables"]
    assert os.path.exists(os.path.join(snap, admin.SNAPSHOT_FILE))

    dest = str(tmp_path / "restored")
    admin.restore_index(snap, dest)
    with pytest.raises(FileExistsError):
        admin.restore_index(snap, dest)

    orig = IndexReader(spark, index_dir).search("flushBuffer retry", k=5).collect()
    rest = IndexReader(spark, dest).search("flushBuffer retry", k=5).collect()
    assert [(r.doc_id, round(r.score, 6)) for r in rest] == [
        (r.doc_id, round(r.score, 6)) for r in orig
    ]


def test_reindex_full_and_filtered(spark, index_dir, tmp_path):
    src = IndexReader(spark, index_dir)

    full_dir = str(tmp_path / "re_full")
    cfg = IndexConfig(index_dir=full_dir, n_buckets=8, n_shards=2, chunk_cap=256)
    admin.reindex(spark, index_dir, cfg)
    rf = IndexReader(spark, full_dir)
    assert rf.doc_count() == src.doc_count()
    # scores identical: same docs, same ids, same stats
    a = src.search("flushBuffer retry", k=5, round_to=6).collect()
    b = rf.search("flushBuffer retry", k=5, round_to=6).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]

    filt_dir = str(tmp_path / "re_filt")
    cfg2 = IndexConfig(index_dir=filt_dir, n_buckets=8, n_shards=2, chunk_cap=256)
    admin.reindex(spark, index_dir, cfg2, query="flushBuffer")
    rq = IndexReader(spark, filt_dir)
    expected = src.score_all("flushBuffer").count()
    assert rq.doc_count() == expected > 0


def test_cat_indices(index_dir, tmp_path):
    rows = admin.cat_indices([index_dir, str(tmp_path / "missing")])
    by_health = {r["health"] for r in rows}
    assert by_health == {"green", "red"}
    green = [r for r in rows if r["health"] == "green"][0]
    assert green["docs_count"] == 150 and green["store_size_bytes"] > 0


def test_cli_admin_roundtrip(index_dir, tmp_path, capsys):
    from esbulk_spark.cli import main

    reg = str(tmp_path / "reg")
    assert main(["alias", "--registry", reg, "--put", "live",
                 "--index-dir", index_dir]) == 0
    assert main(["alias", "--registry", reg, "--list"]) == 0
    out = capsys.readouterr().out
    assert "live" in out and os.path.abspath(index_dir) in out

    snap = str(tmp_path / "clisnap")
    assert main(["snapshot", "--index-dir", index_dir, "--snap-dir", snap]) == 0
    dest = str(tmp_path / "clirestore")
    assert main(["restore", "--snap-dir", snap, "--index-dir", dest]) == 0
    assert main(["cat", "--index-dirs", f"{index_dir},{dest}"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    cat = [r for r in rows if r.get("health")]
    assert len(cat) == 2 and all(r["health"] == "green" for r in cat)
    assert cat[0]["docs_count"] == cat[1]["docs_count"] == 150
