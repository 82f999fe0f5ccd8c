"""Hit-context fetch: top-k search results enriched with the
surrounding turns of their conversation — the grounding window a RAG
consumer renders around each matching turn.

The reference's aggregate-counts answers gather the stored fields of
the newest/oldest doc per group from the activity row store
(``AggregateCounts.java:93-384``); this is the same row-store gather,
keyed on the hit's conversation neighborhood instead of a pivot group.

Scale notes (100 TB): the k hits are a broadcast relation; ONE docs
row-store scan joins against them on conv_id (with the turn window as
the join's range condition) — output is k·(before+after+1) rows, never
a corpus-sized intermediate. On an Iceberg deployment partitioned (or
z-ordered) by conv_id the broadcast join's dynamic filter prunes the
scan to the touched partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.bm25 import search


def search_with_context(
    index: InvertedIndex,
    query,
    k: int = 10,
    before: int = 1,
    after: int = 1,
    sep: str = "\n",
    **search_kw,
) -> DataFrame:
    """Top-k search plus a rendered context window per hit.

    Returns (conv_id, turn_idx, docint, score, context) in the
    engine's (score desc, docint desc) order; ``context`` is the hit's
    conversation turns from ``turn_idx - before`` to ``turn_idx +
    after`` inclusive, each rendered ``role: text``, joined by ``sep``
    in turn order (the hit's own turn included — the window a reader
    sees).
    """
    hits = search(index, query, k=k, **search_kw).select(
        "conv_id",
        F.col("turn_idx").alias("_hit_turn"),
        "docint",
        "score",
    )
    neigh = index.docs.select(
        # explicit alias: hits' conv_id descends from the same attribute,
        # and a same-id equi-join draws Spark's "trivially true equals"
        # warning even though plan-side resolution keeps it correct
        F.col("conv_id").alias("_ctx_conv"),
        F.col("turn_idx").alias("_ctx_turn"),
        F.concat_ws(": ", F.col("role"), F.col("text")).alias("_line"),
    )
    ctx = (
        F.broadcast(hits)
        .join(
            neigh,
            (hits["conv_id"] == neigh["_ctx_conv"])
            & (neigh["_ctx_turn"] >= hits["_hit_turn"] - before)
            & (neigh["_ctx_turn"] <= hits["_hit_turn"] + after),
        )
        .select(
            hits["conv_id"],
            "_hit_turn",
            "docint",
            "score",
            "_ctx_turn",
            "_line",
        )
        .groupBy("conv_id", "_hit_turn", "docint", "score")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_ctx_turn", "_line"))
                    ),
                    lambda s: s["_line"],
                ),
                sep,
            ).alias("context")
        )
        .select(
            "conv_id",
            F.col("_hit_turn").alias("turn_idx"),
            "docint",
            "score",
            "context",
        )
        .orderBy(F.desc("score"), F.desc("docint"))
    )
    return ctx
