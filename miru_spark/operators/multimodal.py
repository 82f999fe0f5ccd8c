"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``.

Geometry decode is REAL for PNG / JPEG / GIF: the container formats
put width/height in fixed header positions (PNG IHDR, JPEG SOFn
segment, GIF logical screen descriptor), so :func:`parse_image_header`
reads them from raw bytes with no codec library. Payloads that are not
one of the three formats fall back to a clearly-marked DETERMINISTIC
fake geometry derived from the content hash, so text-bytes adapters
stay oracle-checkable. Pixel-level decode (and audio/video frame
extraction) would need PIL/ffmpeg, which are absent in this container —
that layer stays stubbed; swapping it in changes one function.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, n_bytes int, content_hash long, width int, height int, fmt string"
)

# JPEG start-of-frame markers that carry geometry (C0-CF minus the
# non-SOF C4/C8/CC per ITU T.81 table B.1)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}
# standalone markers with no length field (RSTn, TEM)
_JPEG_STANDALONE = set(range(0xD0, 0xDA)) | {0x01}


def parse_image_header(b: bytes | None) -> tuple[int, int, str] | None:
    """(width, height, fmt) from raw container bytes, or None if the
    payload is not a recognizable PNG / JPEG / GIF.

    Pure byte arithmetic — no codec import:
    - PNG: 8-byte signature, then the IHDR chunk (required first);
      width/height are the two big-endian u32 at offsets 16/20.
    - GIF: ``GIF87a``/``GIF89a``, then the logical screen descriptor's
      two little-endian u16.
    - JPEG: walk the marker segments from SOI until a SOFn frame
      header; height/width are big-endian u16 at +5/+7 into it.
    """
    if not b:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return (w, h, "png")
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return (w, h, "gif")
    if b[:2] == b"\xff\xd8":
        i = 2
        n = len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                return None  # marker desync: not a parseable JPEG
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in _JPEG_STANDALONE:
                i += 2
                continue
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return (w, h, "jpeg")
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    return None


def synth_image_payload(kind: str, width: int, height: int, pad_to: int = 64) -> bytes:
    """Deterministic minimal valid header bytes for ``kind`` —
    geometry round-trips through :func:`parse_image_header`. Used by
    tests and the oracle-checked decode query (the container ships no
    image fixtures); zero-padded to a fixed length so byte counts are
    a pure function of ``pad_to``."""
    if kind == "png":
        ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
        out = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"  # CRC not validated by the header parse
        )
    elif kind == "gif":
        out = b"GIF89a" + struct.pack("<HH", width, height)
    elif kind == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">H", 17)
            + bytes([8])
            + struct.pack(">HH", height, width)
            + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        )
        out = b"\xff\xd8" + app0 + sof0
    else:
        raise ValueError(f"unknown payload kind {kind!r}")
    if len(out) < pad_to:
        out += bytes(pad_to - len(out))
    return out


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Decode a batch of image payloads → (content_hash, width,
    height, fmt).

    PNG/JPEG/GIF geometry is parsed from the real header bytes;
    anything else falls back to the DETERMINISTIC fake geometry
    (hash-derived, fmt='fake') so non-image adapters remain exercisable
    and oracle-checkable.
    """
    hashes = [
        int(hashlib.md5(b or b"").hexdigest()[:15], 16) for b in payloads
    ]
    widths, heights, fmts = [], [], []
    for b, h in zip(payloads, hashes):
        parsed = parse_image_header(b)
        if parsed is not None:
            w, ht, fmt = parsed
        else:
            w, ht, fmt = 1 + (h % 1920), 1 + ((h // 1920) % 1080), "fake"
        widths.append(w)
        heights.append(ht)
        fmts.append(fmt)
    return pd.DataFrame(
        {
            "content_hash": hashes,
            "width": widths,
            "height": heights,
            "fmt": fmts,
        }
    )


def extract_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """binary column → per-item feature rows (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_image_batch(pdf[bin_col])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": [len(b or b"") for b in pdf[bin_col]],
                    "content_hash": meta["content_hash"],
                    "width": meta["width"],
                    "height": meta["height"],
                    "fmt": meta["fmt"],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def parse_wav_header(b: bytes | None) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits_per_sample, n_samples) from RIFF/
    WAVE bytes, or None. Real byte-level parse (chunk walk to ``fmt ``
    and ``data``), no codec import — PCM audio metadata is pure header
    arithmetic the same way image geometry is."""
    if not b or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    rate = channels = bits = None
    n_samples = None
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            _, channels, rate = struct.unpack("<HHI", b[i + 8 : i + 16])
            bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
        elif cid == b"data" and channels and bits:
            n_samples = size // (channels * (bits // 8))
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or n_samples is None:
        return None
    return (rate, channels, bits, n_samples)


def synth_wav_payload(
    sample_rate: int, channels: int, bits: int, n_samples: int
) -> bytes:
    """Minimal valid RIFF/WAVE header (no sample data — the ``data``
    chunk declares its size; tests/oracle only need the metadata
    round-trip). Deterministic."""
    data_size = n_samples * channels * (bits // 8)
    byte_rate = sample_rate * channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate,
        channels * (bits // 8), bits,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
    )


AUDIO_SCHEMA = (
    "id long, n_bytes int, sample_rate int, channels int, bits int,"
    " n_samples long, duration_ms long"
)


def extract_audio_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """binary WAV column → per-item audio metadata rows (Arrow-batched
    mapInPandas; real header parse, unparseable rows → NULL metadata)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                parsed = parse_wav_header(b)
                if parsed is None:
                    rows.append((int(i), len(b or b""), None, None, None, None, None))
                else:
                    rate, ch, bits, ns = parsed
                    rows.append(
                        (int(i), len(b or b""), rate, ch, bits, ns,
                         ns * 1000 // rate)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "n_bytes", "sample_rate", "channels", "bits",
                    "n_samples", "duration_ms",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=AUDIO_SCHEMA)


def resize_geometry(
    feats: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Aspect-fit resize planning over decoded geometry — REAL
    arithmetic as pure column expressions (scale = min(max_w/w,
    max_h/h, 1), floor output dims, min 1). Only the pixel resample
    itself would need a codec; a real resizer consumes exactly
    (id, out_w, out_h) this relation produces."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return feats.select(
        "id",
        "width",
        "height",
        "fmt",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("int")
        .alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("int")
        .alias("out_h"),
    )


def sample_frame_indices(
    videos: DataFrame,
    every_ms: int = 1000,
    id_col: str = "id",
    duration_col: str = "duration_ms",
    fps_col: str = "fps",
) -> DataFrame:
    """(id, frame_idx) — deterministic frame-sampling plan: one frame
    every ``every_ms`` of wall time, frame_idx = floor(t_ms·fps/1000).
    Pure ``sequence``+``transform`` column arithmetic; the frame DECODE
    consuming these indices is the codec-bound stub. Bounded per row by
    duration/every_ms — no explosion risk beyond the requested rate."""
    n = F.greatest(
        (F.col(duration_col) / F.lit(int(every_ms))).cast("long"), F.lit(0)
    )
    idxs = F.transform(
        F.sequence(F.lit(0), n),
        lambda i: (
            i.cast("double") * every_ms * F.col(fps_col) / F.lit(1000.0)
        ).cast("long"),
    )
    return videos.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(idxs)).alias("frame_idx"),
    )


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload so the
    multimodal plumbing is exercisable against the driver's tables."""
    return docs.select(
        F.col("doc_id").alias("id"), F.encode("text", "UTF-8").alias("payload")
    )


def documents_as_images(docs: DataFrame) -> DataFrame:
    """Adapter: deterministic synthetic image payloads keyed off
    doc_id — kind cycles png/gif/jpeg, geometry is doc_id arithmetic —
    so the REAL header-parse path is exercisable (and its oracle can
    recompute the expected geometry in pure SQL)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["png", "gif", "jpeg"]
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                synth_image_payload(
                    kinds[int(i) % 3], 16 + int(i) % 640, 16 + (int(i) * 7) % 480
                )
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, schema="id long, payload binary")


def documents_as_audio(docs: DataFrame) -> DataFrame:
    """Adapter: deterministic synthetic WAV payloads keyed off doc_id
    (rate cycles 8k/16k/44.1k, mono/stereo, 8/16-bit, n_samples from
    doc_id arithmetic) so the real RIFF parse is exercisable and its
    oracle can recompute every field in SQL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rates = [8000, 16000, 44100]
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                synth_wav_payload(
                    rates[int(i) % 3],
                    1 + int(i) % 2,
                    8 * (1 + int(i) % 2),
                    1000 + (int(i) * 37) % 50000,
                )
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, schema="id long, payload binary")
