"""Delta-gap + varint (LEB128) posting-list codec, vectorized in numpy.

The reference stores posting bitmaps "atomized" into fixed-key blocks
(enterstudio/miru ``miru-service/.../index/lab/LabInvertedIndex.java:268-292``
— a posting list is physically a set of bitmap chunks keyed by
``(termKey, 0xFFFF - blockKey)``). Roaring bitmaps are themselves a
compressed docid-set codec; here we use the classic inverted-index
encoding instead (sorted docids → first-difference gaps → LEB128
varints), which suits columnar storage and block-max WAND metadata.

Everything is numpy array-at-a-time — no per-int Python loops — so the
codec runs inside Arrow-batched pandas UDFs at full speed.
"""

from __future__ import annotations

import numpy as np


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value: ceil(bitlength/7), min 1.

    Shared by the encoder and by block writers that need per-list
    offsets into a concatenated encoding (one definition — the lengths
    can never drift from what :func:`varint_encode` actually emits)."""
    v = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    return np.maximum((nbits + 6) // 7, 1)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = varint_lengths(v)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # fill byte k of each value (k < nbytes[i])
    max_len = int(nbytes.max())
    for k in range(max_len):
        sel = nbytes > k
        idx = offsets[:-1][sel] + k
        chunk = (v[sel] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1) > k  # continuation bit
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    max_len = int(lengths.max())
    for k in range(max_len):
        sel = lengths > k
        chunk = b[starts[sel] + k].astype(np.uint64) & np.uint64(0x7F)
        values[sel] |= chunk << np.uint64(7 * k)
    return values


def encode_postings(docints: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted docints, tfs) → (delta-gap varint docs, varint tfs)."""
    d = np.asarray(docints, dtype=np.uint64)
    if d.size == 0:
        return b"", b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    return varint_encode(gaps), varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_postings(docs_buf: bytes, tfs_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` → (docints int64, tfs int32)."""
    gaps = varint_decode(docs_buf)
    docs = np.cumsum(gaps, dtype=np.uint64)
    tfs = varint_decode(tfs_buf)
    return docs.astype(np.int64), tfs.astype(np.int32)
