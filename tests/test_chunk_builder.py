"""Regression: the streaming chunk encoder must never let reduceat
segments run into the held-over tail group (ADVICE r1, build.py emit()).

With the bug, the LAST emitted chunk of every Arrow batch absorbed the
pending tail rows into chunk_cf / max_tfnorm / block_max_tfnorm, making
dictionary cf silently wrong and index bytes dependent on Arrow batching.
"""

import numpy as np
import pandas as pd

from esbulk_spark.config import IndexConfig
from esbulk_spark.plans.build import make_chunk_builder, _tfnorm


def _batch(rows):
    return pd.DataFrame(rows, columns=["term", "shard", "doc_id", "tf", "dl"])


def _run(builder, batches):
    out = list(builder(iter(batches)))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def test_tail_group_does_not_contaminate_last_chunk():
    cfg = IndexConfig(index_dir="/tmp/unused", chunk_cap=1 << 15, block_size=128)
    avgdl = 10.0
    builder = make_chunk_builder(cfg, avgdl)
    # batch 1 ends mid-group 'bbb' (held over); 'aaa' is the last COMPLETE
    # group of batch 1 — its stats must come from its own 3 rows only
    b1 = _batch([
        ("aaa", 0, 1, 1, 10),
        ("aaa", 0, 2, 1, 10),
        ("aaa", 0, 3, 1, 10),
        ("bbb", 0, 10, 100, 10),
    ])
    b2 = _batch([
        ("bbb", 0, 11, 100, 10),
        ("bbb", 0, 12, 3, 10),
    ])
    chunks = _run(builder, [b1, b2])
    aaa = chunks[chunks.term == "aaa"].iloc[0]
    assert int(aaa["chunk_cf"]) == 3  # was 203 with the bug
    expected_max = float(
        _tfnorm(np.array([1]), np.array([10]), cfg.k1, cfg.b, avgdl)[0]
    )
    assert abs(float(aaa["max_tfnorm"]) - expected_max) < 1e-12  # was tf=100's norm
    assert list(aaa["block_max_tfnorm"]) == [float(aaa["max_tfnorm"])]
    bbb = chunks[chunks.term == "bbb"].iloc[0]
    assert int(bbb["chunk_cf"]) == 203
    assert int(bbb["n"]) == 3


def test_chunk_bytes_independent_of_batching():
    cfg = IndexConfig(index_dir="/tmp/unused", chunk_cap=8, block_size=4)
    avgdl = 7.0
    rng = np.random.RandomState(3)
    rows = []
    for t in ["t%02d" % i for i in range(6)]:
        n = rng.randint(1, 20)
        ids = np.sort(rng.choice(10_000, size=n, replace=False))
        for d in ids:
            rows.append((t, int(d) // 5000, int(d), int(rng.randint(1, 9)), 7))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    whole = _run(make_chunk_builder(cfg, avgdl), [_batch(rows)])
    for cutpoints in [[3], [1, 2], [5, 11, 17], list(range(1, len(rows)))]:
        parts, prev = [], 0
        for c in cutpoints:
            parts.append(_batch(rows[prev:c]))
            prev = c
        parts.append(_batch(rows[prev:]))
        split = _run(make_chunk_builder(cfg, avgdl), parts)
        a = whole.sort_values(["term", "shard", "chunk"]).reset_index(drop=True)
        b = split.sort_values(["term", "shard", "chunk"]).reset_index(drop=True)
        assert len(a) == len(b)
        for col in ["term", "shard", "chunk", "min_doc", "max_doc", "n", "chunk_cf"]:
            assert a[col].tolist() == b[col].tolist(), col
        for col in ["blob_ids", "blob_tfs", "blob_dls"]:
            assert [bytes(x) for x in a[col]] == [bytes(x) for x in b[col]], col
        for col in ["max_tfnorm"]:
            assert np.allclose(a[col].values.astype(float), b[col].values.astype(float))
        for col in ["block_last", "block_max_tfnorm", "off_ids"]:
            assert [list(x) for x in a[col]] == [list(x) for x in b[col]], col
