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


def search_grouped(
    index: InvertedIndex,
    query: str | Node,
    k_groups: int = 10,
    per_group: int = 3,
    group_col: str = "conv_id",
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Grouped top-N: the ``k_groups`` best groups (ranked by their best
    member, collapse order), each expanded to its top ``per_group``
    matching docs — Lucene grouping / Solr ``group.limit``.

    Returns (group_col, turn_idx, docint, score, grp_rank, doc_rank)
    ordered by (grp_rank, doc_rank). grp_rank ranks groups 1..k_groups;
    doc_rank ranks members 1..per_group inside their group, both in the
    engine's (score desc, docint desc) order.

    The only window runs AFTER the k_groups semi-join — its input is
    the members of k groups (bounded by k·group-size), never the full
    answer set; group discovery itself is the same single
    groupBy+TakeOrdered as :func:`search_collapse`.
    """
    from pyspark.sql import Window

    scored = scored_matches(index, query, ts_lo=ts_lo, ts_hi=ts_hi)
    groups = index.docs.select("docint", group_col, "turn_idx")
    members = scored.join(groups, "docint")
    # group ranking: one groupBy + TakeOrdered, then the k-row result is
    # collected driver-side and re-broadcast with explicit ranks (the
    # WAND-floor constant-size-collect pattern — NOT a global window,
    # which would funnel every group through one partition)
    top_rows = (
        members.groupBy(group_col)
        .agg(F.max(F.struct("score", "docint")).alias("_best"))
        .orderBy(F.desc("_best"))
        .limit(k_groups)
        .collect()
    )
    spark = index.docs.sparkSession
    top_groups = spark.createDataFrame(
        [(r[group_col], i + 1) for i, r in enumerate(top_rows)],
        schema=f"{group_col} string, grp_rank int",
    )
    # top_groups is k rows — broadcast; the member window sees only
    # those groups' rows
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.desc("docint"))
    out = (
        members.join(F.broadcast(top_groups), group_col)
        .withColumn("doc_rank", F.row_number().over(w))
        .where(F.col("doc_rank") <= per_group)
    )
    return out.orderBy("grp_rank", "doc_rank").select(
        group_col, "turn_idx", "docint", "score", "grp_rank", "doc_rank"
    )
