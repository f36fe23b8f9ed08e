"""Delta+varint codec round-trips (SURVEY.md B6, §5 test plan item 1).

Property-style over random arrays, mirroring the reference's deterministic
fixture strategy (/root/reference/fixtures/gen.py) with hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from esbulk_spark.functions.codec import (
    BLOCK_SIZE,
    decode_block,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
    varint_encode_blocks,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=2000, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip_and_blockwise(ids):
    ids = np.sort(np.array(ids, dtype=np.uint64))
    blob, offs, lasts = encode_postings(ids)
    assert np.array_equal(delta_decode(varint_decode(blob)), ids)
    for bi in range(len(offs)):
        cnt = min(BLOCK_SIZE, ids.size - bi * BLOCK_SIZE)
        blk = decode_block(blob, offs, lasts, bi, cnt)
        assert np.array_equal(blk, ids[bi * BLOCK_SIZE: bi * BLOCK_SIZE + cnt])


def test_varint_boundaries():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**35, 2**63 - 1, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


def test_offset_count_decode():
    enc = varint_encode(np.arange(1000, dtype=np.uint64) * 3)
    assert np.array_equal(
        varint_decode(enc, count=10), np.arange(10, dtype=np.uint64) * 3
    )


def test_block_offsets_skip_decode():
    vals = np.random.RandomState(0).randint(0, 2**20, 1000).astype(np.uint64)
    blob, offs = varint_encode_blocks(vals, block_size=128)
    # decode the 3rd block directly
    got = varint_decode(blob, offset=int(offs[2]), count=128)
    assert np.array_equal(got, vals[256:384])


def test_delta_empty():
    e = np.zeros(0, dtype=np.uint64)
    assert delta_encode(e).size == 0
    assert delta_decode(e).size == 0
    assert varint_encode(e) == b""
