"""Co-occurrence features + collaborative filtering (reco family).

Reference semantics (enterstudio/miru):

- ``gatherFeatures`` — for an answer set, batch-join docIds back to
  feature fields and emit counted value-permutations, top-N per feature
  (``miru-plugin/.../solution/MiruAggregateUtil.java:77-442``). Spark:
  semi-join answer → groupBy(featureCols).count → window top-N: one
  shuffle replaces the iterated bitmap joins.
- ``CollaborativeFiltering`` — the 3-step pipeline: my items → other
  users active on them (weighted contributors) → their items minus
  mine, scored by contributor weight
  (``miru-reco-plugins/.../reco/CollaborativeFiltering.java:58-213``).
  Spark: a chain of semi-joins + groupBy aggs + top-k, exactly the
  bitmap semi/anti-join + heap structure of the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_features(
    answer_docs: DataFrame,  # docint
    docs: DataFrame,  # docint + feature columns
    feature_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Top-N counted feature-value permutations over the answer set.

    The reference caps per-feature results with a heap
    (``MiruAggregateUtil.java:105-108``); the Spark equivalent is
    TakeOrderedAndProject (orderBy + limit — per-partition k-heaps merged
    on the driver), NOT a global row_number window: an unpartitioned
    window funnels every (permutation, count) row through one partition,
    which is unbounded for high-cardinality features. Rank is then
    assigned over the already-limited top_n rows in one Arrow batch
    (ranking.rank_small — no WindowExec at all)."""
    from miru_spark.ranking import rank_small

    order = [F.desc("n")] + [F.asc(c) for c in feature_cols]
    joined = docs.join(answer_docs, "docint", "left_semi")
    counts = joined.groupBy(*feature_cols).agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(*order).limit(top_n)
    ranked = rank_small(
        top, [("n", "desc")] + [(c, "asc") for c in feature_cols]
    )
    return ranked.select(*feature_cols, "n", "rank")


def collaborative_filter(
    interactions: DataFrame,  # user_id, item
    user_id: int,
    top_contributors: int = 10,
    top_items: int = 10,
) -> DataFrame:
    """Items to recommend to ``user_id`` via weighted co-activity.

    contributors = other users ranked by #interactions on my items;
    recommendation score(item) = Σ weight(contributor) over top
    contributors who touched the item, items I already have excluded.
    """
    mine = interactions.where(F.col("user_id") == user_id).select("item").distinct()
    contributors = (
        interactions.where(F.col("user_id") != user_id)
        .join(F.broadcast(mine), "item", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy(F.desc("weight"), F.asc("user_id"))
        .limit(top_contributors)
    )
    their_items = (
        interactions.join(F.broadcast(contributors), "user_id")
        .select("user_id", "item", "weight")
        .distinct()  # one vote per (contributor, item)
        .join(F.broadcast(mine), "item", "left_anti")
    )
    return (
        their_items.groupBy("item")
        .agg(F.sum("weight").alias("score"))
        .orderBy(F.desc("score"), F.asc("item"))
        .limit(top_items)
    )
