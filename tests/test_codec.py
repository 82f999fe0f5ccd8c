"""Codec round-trip (no Spark) — property-based (FIXTURES.md §3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_spark.indexing.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr))) == vals


def test_varint_edge_values():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**21, 2**28, 2**35, 2**63 - 1],
        dtype=np.uint64,
    )
    out = varint_decode(varint_encode(vals))
    assert (out == vals).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=1000),
        ),
        max_size=300,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(pairs):
    pairs.sort()
    docs = np.array([p[0] for p in pairs], dtype=np.int64)
    tfs = np.array([p[1] for p in pairs], dtype=np.int32)
    db, tb = encode_postings(docs, tfs)
    d2, t2 = decode_postings(db, tb)
    assert (d2 == docs).all()
    assert (t2 == tfs).all()


def test_compression_wins():
    """Dense sorted runs must compress well below 8 bytes/doc."""
    docs = np.arange(100_000, dtype=np.int64) * 3
    tfs = np.ones(100_000, dtype=np.int32)
    db, tb = encode_postings(docs, tfs)
    assert len(db) < 100_000 * 2  # gaps of 3 fit in 1 byte
    assert len(tb) == 100_000
