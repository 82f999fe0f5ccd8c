"""Hybrid lexical + vector search: BM25 candidates reranked by
embedding cosine.

The modern retrieval stack pairs an inverted index with a vector
index: the inverted index nominates a candidate pool cheaply
(index-only postings plan), the embedding similarity re-scores the
pool, and the final rank blends both signals — Vespa/Elastic "hybrid
search", the retrieval shape RAG pipelines expect. The reference
engine has the lexical half (FullText, FullText.java:99-220) and no
vector half; this module composes the engine's two existing scale
paths instead of inventing a third.

Spark-first plan:

1. BM25 top-``candidates`` via :func:`miru_spark.query.bm25.search` —
   TakeOrderedAndProject, so the candidate pool is a ``candidates``-row
   relation, never the answer set;
2. the pool (≤ a few hundred rows) joins the embedding table
   **broadcast** on the caller-supplied key — the big side streams
   once, no shuffle;
3. cosine to the (literal, closure-carried) query vector as pure JVM
   column arithmetic (``zip_with``/``aggregate`` — no Python, no UDF);
4. blended score ``alpha·bm25 + (1-alpha)·cosine``, TakeOrdered k.

At 100 TB the vector side cost is one broadcast-joined scan of the
candidate ids against the embeddings table (partition-prunable when
the embedding table is bucketed by id); the expensive work stays in
the BM25 stage that is already index-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.operators.similarity import _dot, _norm
from miru_spark.query.ast import Node
from miru_spark.query.bm25 import search


def search_hybrid(
    index: InvertedIndex,
    query: str | Node,
    embeddings: DataFrame,
    query_vec: list[float],
    key_expr: Column,
    k: int = 10,
    candidates: int = 100,
    alpha: float = 0.5,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by ``alpha·bm25 + (1-alpha)·cosine(query_vec, doc_vec)``.

    ``key_expr`` maps a search hit (conv_id, turn_idx, docint) to its
    row key in ``embeddings`` (corpus-specific identity). Hits with no
    embedding row keep their BM25 score and cosine 0 (left join) — a
    missing vector must not silently drop a strong lexical hit.

    Returns (conv_id, turn_idx, docint, bm25, cosine, hybrid) ordered
    by (hybrid desc, docint desc).
    """
    pool = search(index, query, k=candidates).withColumn("_k", key_expr)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    e = embeddings.select(
        F.col(emb_id_col).alias("_k"), F.col(vec_col).alias("_v")
    )
    # pool is ≤`candidates` rows: broadcast it, the embedding scan streams
    joined = e.join(F.broadcast(pool), "_k")
    cos = _dot(F.col("_v"), qlit) / (_norm(F.col("_v")) * _norm(qlit))
    scored = (
        pool.join(
            joined.select("_k", cos.alias("_cos")), "_k", "left"
        )
        .withColumn("cosine", F.coalesce(F.col("_cos"), F.lit(0.0)))
        .withColumn(
            "hybrid",
            F.lit(float(alpha)) * F.col("score")
            + F.lit(1.0 - float(alpha)) * F.col("cosine"),
        )
    )
    return (
        scored.orderBy(F.desc("hybrid"), F.desc("docint"))
        .limit(k)
        .select(
            "conv_id",
            "turn_idx",
            "docint",
            F.col("score").alias("bm25"),
            "cosine",
            "hybrid",
        )
    )
