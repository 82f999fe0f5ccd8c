"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The decode libraries (PIL/ffmpeg/…)
are NOT in this container, so the actual decoders are stubbed behind an
import-try — the Spark-side plumbing (schema, batch shape, partition
behavior, deterministic fake features) is real and tested, and swapping
the stub for a real decoder changes one function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, n_bytes int, content_hash long, width int, height int, fmt string"
)


def _try_real_decoder():
    try:  # pragma: no cover - decode libs absent in this container
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Decode a batch of image payloads → (width, height, fmt).

    With a real codec present this opens each payload; here it derives
    a DETERMINISTIC fake geometry from the content hash so the full
    pipeline (schema, joins, aggregations) is exercisable and
    oracle-checkable. The fake is clearly marked.
    """
    pil = _try_real_decoder()
    if pil is not None:  # pragma: no cover
        raise NotImplementedError(
            "real decode path intentionally unimplemented in this build"
        )
    hashes = [
        int(hashlib.md5(b or b"").hexdigest()[:15], 16) for b in payloads
    ]
    return pd.DataFrame(
        {
            "content_hash": hashes,
            "width": [1 + (h % 1920) for h in hashes],
            "height": [1 + ((h // 1920) % 1080) for h in hashes],
            "fmt": ["fake" for _ in hashes],
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


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload so the
    multimodal plumbing is exercisable against the driver's tables."""
    return docs.select(
        F.col("doc_id").alias("id"), F.encode("text", "UTF-8").alias("payload")
    )
