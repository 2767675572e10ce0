"""Codec golden byte vectors (reference `Team3CompressorTest.java:22-56`)
and round-trip property tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_search_engine_ray.functions.codecs import (
    decode_many,
    encode_many,
    naive_decode,
    naive_encode,
    varint_decode,
    varint_decode_slice,
    varint_encode,
)

GOLDEN = [
    ([1, 2, 3, 4, 5, 6], "010101010101"),
    ([128, 384, 896, 1920, 3968], "81008200840088009000"),
    ([2147483647], "87ffffff7f"),
    ([], ""),
    ([0], "00"),
]


@pytest.mark.parametrize("ints,hexbytes", GOLDEN)
def test_golden_encode(ints, hexbytes):
    assert varint_encode(ints).hex() == hexbytes


@pytest.mark.parametrize("ints,hexbytes", GOLDEN)
def test_golden_decode(ints, hexbytes):
    assert list(varint_decode(bytes.fromhex(hexbytes))) == ints


def test_int64_doc_ids():
    v = [0, 2**40, 2**40 + 1, 2**62]
    assert list(varint_decode(varint_encode(v))) == v


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**45), max_size=60))
def test_roundtrip_sorted(vals):
    v = np.sort(np.asarray(vals, dtype=np.int64))
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31), max_size=60))
def test_roundtrip_nodelta(vals):
    v = np.asarray(vals, dtype=np.int64)
    assert np.array_equal(varint_decode(varint_encode(v, delta=False), delta=False), v)


def test_slice_decode():
    rng = np.random.default_rng(7)
    lists = [np.sort(rng.integers(0, 10**6, rng.integers(1, 25))) for _ in range(20)]
    bufs = [varint_encode(l) for l in lists]
    cat = b"".join(bufs)
    off = 0
    for l, bb in zip(lists, bufs):
        assert np.array_equal(varint_decode_slice(cat, off, len(bb)), l)
        off += len(bb)


@pytest.mark.parametrize("delta", [True, False])
def test_encode_many_matches_single(delta):
    rng = np.random.default_rng(3)
    lists = [np.sort(rng.integers(0, 2**35, rng.integers(0, 30))) for _ in range(150)]
    lists[0] = np.empty(0, dtype=np.int64)
    lists[-1] = np.empty(0, dtype=np.int64)
    flat = np.concatenate(lists + [np.empty(0, np.int64)])
    offs = np.concatenate(([0], np.cumsum([len(l) for l in lists]))).astype(np.int64)
    buf, boff = encode_many(flat, offs, delta=delta)
    for i, l in enumerate(lists):
        assert buf[boff[i] : boff[i + 1]] == varint_encode(l, delta=delta)
    vals, voff = decode_many(buf, boff, delta=delta)
    assert np.array_equal(vals, flat)
    assert np.array_equal(voff, offs)


def test_naive_codec():
    assert naive_encode([1, 256]).hex() == "0000000100000100"
    assert list(naive_decode(naive_encode([5, 6, 7]))) == [5, 6, 7]


def test_compression_beats_naive():
    # analogue of the reference's page-count ratio gate
    # (`Team6IndexCompressionTest`): delta+varint must be well under
    # 4-byte naive on realistic ascending doc ids.
    rng = np.random.default_rng(11)
    doc_ids = np.sort(rng.choice(10**7, size=100_000, replace=False))
    compressed = len(varint_encode(doc_ids))
    naive = len(naive_encode(doc_ids % (2**31)))
    assert compressed < naive * 2 / 3


def test_compressor_plugin_surface():
    """Reference `Compressor` interface parity (encode/decode with
    (start, length) slicing, `index/positional/Compressor.java:5-28`)."""
    from mini_search_engine_ray.functions.codecs import (
        DeltaVarLenCompressor,
        NaiveCompressor,
    )

    c = DeltaVarLenCompressor()
    enc = c.encode([1, 2, 3, 4, 5, 6])
    assert enc.hex() == "010101010101"
    assert c.decode(enc) == [1, 2, 3, 4, 5, 6]
    assert c.decode(b"\xff" + enc, 1, len(enc)) == [1, 2, 3, 4, 5, 6]
    n = NaiveCompressor()
    assert n.decode(n.encode([7, 8])) == [7, 8]
    assert n.decode(n.encode([7, 8]), 4, 4) == [8]
