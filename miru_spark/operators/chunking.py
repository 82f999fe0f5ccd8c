"""Sliding-window document chunking (token windows with overlap).

The RAG/context-window primitive the packing operator deliberately
doesn't cover: ``packing.pack_chunks`` lays out WHOLE docs into fixed
budgets (pretraining batches), while ``chunk_documents`` splits EACH
doc into overlapping token windows (retrieval corpora, long-doc
training examples, embedding inputs).

Scale shape: one projection + posexplode — chunk starts are a tiny
per-doc ``sequence`` (a handful of ints per document), the explode is
the per-chunk row stream, and everything is JVM-side column
expressions. No shuffle, no Python, no window function; row count is
``Σ ceil(n_i / step)``, the output's own size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.tokenize import tokens_col


def chunk_documents(
    docs: DataFrame,
    size: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each doc's token stream into windows of ``size`` tokens
    advancing by ``size - overlap``: (id, chunk_idx, start, n_tokens,
    chunk_text). The final window may be shorter; empty docs yield no
    chunks. Deterministic by construction (pure function of the text).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    step = size - overlap
    base = docs.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("t")
    ).where(F.size("t") > 0)
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(step))
    ex = base.select("id", "t", F.posexplode(starts).alias("chunk_idx", "start"))
    piece = F.slice("t", F.col("start") + 1, size)
    return ex.select(
        "id",
        "chunk_idx",
        "start",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
