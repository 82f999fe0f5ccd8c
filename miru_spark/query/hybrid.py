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


def search_rrf(
    index: InvertedIndex,
    query: str | Node,
    embeddings: DataFrame,
    query_id: int,
    key_expr: Column,
    k: int = 10,
    candidates: int = 50,
    rrf_k: int = 60,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal Rank Fusion: ``Σ 1/(rrf_k + rank)`` over the lexical
    top-``candidates`` (BM25) and the vector top-``candidates`` (cosine
    to the ``query_id`` row) — the calibration-free hybrid ranking
    (Cormack et al. '09) that fuses RANKS, so BM25 and cosine scales
    never need normalizing (unlike :func:`search_hybrid`'s blend).

    Both retrievals run distributed (index-only BM25 TakeOrdered; one
    embedding scan TakeOrdered); their ``candidates``-row results are
    collected driver-side (constant-size, the WAND-floor pattern), fused
    in plain Python, and re-broadcast for the metadata join. Ties break
    (rrf desc, docint desc).

    Returns (conv_id, turn_idx, docint, rrf, bm_rank, vec_rank) —
    rank columns null when a doc appears on only one list.
    """
    from miru_spark.operators.similarity import cosine_topk

    bm_rows = (
        search(index, query, k=candidates).withColumn("_k", key_expr).collect()
    )
    bm_rank = {int(r["_k"]): i + 1 for i, r in enumerate(bm_rows)}
    vec_rows = cosine_topk(
        embeddings, query_id, k=candidates, id_col=emb_id_col, vec_col=vec_col
    ).collect()
    vec_rank = {int(r[emb_id_col]): i + 1 for i, r in enumerate(vec_rows)}

    fused = []
    for key in set(bm_rank) | set(vec_rank):
        br, vr = bm_rank.get(key), vec_rank.get(key)
        rrf = (1.0 / (rrf_k + br) if br else 0.0) + (
            1.0 / (rrf_k + vr) if vr else 0.0
        )
        fused.append((key, rrf, br, vr))

    spark = index.docs.sparkSession
    fused_df = spark.createDataFrame(
        fused, "key long, rrf double, bm_rank int, vec_rank int"
    )
    docs = index.docs.withColumn("_k", key_expr).select(
        F.col("_k").alias("key"), "conv_id", "turn_idx", "docint"
    )
    return (
        docs.join(F.broadcast(fused_df), "key")
        .orderBy(F.desc("rrf"), F.desc("docint"))
        .limit(k)
        .select("conv_id", "turn_idx", "docint", "rrf", "bm_rank", "vec_rank")
    )


def search_mmr(
    index: InvertedIndex,
    query: str | Node,
    embeddings: DataFrame,
    query_vec: list[float],
    key_expr: Column,
    k: int = 10,
    candidates: int = 50,
    lam: float = 0.7,
    alpha: float = 0.5,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance: greedy diversified top-k.

    Relevance = the hybrid blend (``alpha·bm25 + (1-alpha)·cosine`` to
    the query vector); at each step pick
    ``argmax lam·rel(i) - (1-lam)·max_{j∈selected} cos(i, j)`` —
    the standard MMR recurrence (Carbonell & Goldstein '98), killing
    near-duplicate hits that a plain top-k would stack.

    The greedy loop is inherently sequential over k picks, so it runs
    driver-side on the COLLECTED candidate pool — ``candidates`` rows ×
    dim floats, the same constant-size two-phase collect as the WAND
    floor. All corpus-scale work (BM25 pool, embedding fetch) stays
    distributed; ties break (value desc, docint desc) so results are
    layout-independent.

    Returns (conv_id, turn_idx, docint, rel, mmr, rank) in pick order.
    No SQL oracle by nature (iterative greedy) — pytest carries the
    reference implementation.
    """
    import numpy as np

    pool = search(index, query, k=candidates).withColumn("_k", key_expr)
    e = embeddings.select(
        F.col(emb_id_col).alias("_k"), F.col(vec_col).alias("_v")
    )
    rows = (
        pool.join(e, "_k", "left")
        .select("conv_id", "turn_idx", "docint", "score", "_v")
        .collect()
    )
    if not rows:
        spark = index.docs.sparkSession
        return spark.createDataFrame(
            [],
            "conv_id string, turn_idx int, docint long, rel double, "
            "mmr double, rank int",
        )

    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    V = np.zeros((len(rows), dim))
    has_v = np.zeros(len(rows), dtype=bool)
    for i, r in enumerate(rows):
        if r["_v"] is not None:
            V[i] = np.asarray(list(r["_v"]), dtype=np.float64)
            has_v[i] = True
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    rel = np.array(
        [
            alpha * r["score"]
            + (1 - alpha) * (float(Vn[i] @ qn) if has_v[i] else 0.0)
            for i, r in enumerate(rows)
        ]
    )
    sim = Vn @ Vn.T  # candidates×candidates — bounded by `candidates`
    sim[~has_v, :] = 0.0
    sim[:, ~has_v] = 0.0

    docints = np.array([r["docint"] for r in rows])
    selected: list[int] = []
    remaining = set(range(len(rows)))
    out_rows = []
    for rank in range(1, min(k, len(rows)) + 1):
        if selected:
            penalty = sim[:, selected].max(axis=1)
        else:
            penalty = np.zeros(len(rows))
        value = lam * rel - (1 - lam) * penalty
        best = max(remaining, key=lambda i: (value[i], docints[i]))
        selected.append(best)
        remaining.discard(best)
        r = rows[best]
        out_rows.append(
            (
                r["conv_id"],
                int(r["turn_idx"]),
                int(r["docint"]),
                float(rel[best]),
                float(value[best]),
                rank,
            )
        )
    spark = index.docs.sparkSession
    return spark.createDataFrame(
        out_rows,
        "conv_id string, turn_idx int, docint long, rel double, "
        "mmr double, rank int",
    )
