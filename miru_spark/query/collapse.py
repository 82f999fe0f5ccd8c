"""Field-collapsed top-k search (one best hit per group).

Search engines collapse result lists on a document field so each group
(here: conversation) appears at most once, represented by its
best-scoring member — Lucene's grouping/``CollapsingTopDocsCollector``,
Solr/ES ``collapse``. The reference reaches the same shape through
AggregateCounts' group-by-latest walk (``AggregateCounts.java:93-384``
picks one representative doc per pivot term); this operator is the
scored upgrade: representative = argmax (score, docint), groups ranked
by their representative's score.

Spark-first plan:

1. score every matching doc via :func:`miru_spark.query.bm25.scored_matches`
   (index-only postings plan, no corpus scan);
2. join the k-irrelevant columns LATE — only ``(docint, group)`` from
   the doc table before the aggregation;
3. ONE ``groupBy(group).agg(max(struct(score, docint)))`` — struct
   ordering is lexicographic so the max is exactly the engine's
   (score desc, docint desc) tie-break (``FullTextAnswer.java:64-90``)
   with a map-side partial aggregate (no window, no per-group sort);
4. ``orderBy(score desc, docint desc).limit(k)`` → TakeOrderedAndProject.

At 100 TB: one shuffle keyed on the group column (conversations are
uniformly sized, no skew), one broadcast-joined k-row metadata fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.ast import Node
from miru_spark.query.bm25 import scored_matches


def search_collapse(
    index: InvertedIndex,
    query: str | Node,
    k: int = 10,
    group_col: str = "conv_id",
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Top-k groups, each represented by its best-scoring matching doc.

    Returns (group_col, turn_idx, docint, score) ordered by
    (score desc, docint desc) over the representatives.
    """
    scored = scored_matches(index, query, ts_lo=ts_lo, ts_hi=ts_hi)
    groups = index.docs.select("docint", group_col)
    best = (
        scored.join(groups, "docint")
        .groupBy(group_col)
        # lexicographic struct max == (score desc, docint desc) argmax
        .agg(F.max(F.struct("score", "docint")).alias("_best"))
        .select(
            group_col,
            F.col("_best.docint").alias("docint"),
            F.col("_best.score").alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("docint"))
        .limit(k)
    )
    meta = index.docs.select("docint", "turn_idx")
    return (
        best.join(meta, "docint")
        .orderBy(F.desc("score"), F.desc("docint"))
        .select(group_col, "turn_idx", "docint", "score")
    )
