"""Strut/catwalk-style ML feature scoring (reference gap #45).

Reference semantics (enterstudio/miru): a *catwalk* model caches, per
feature term, a numerator (occurrences among labeled/answer docs,
gathered via ``gatherFeatures`` — ``Catwalk.java``) and a shared
denominator (global occurrences); *strut* then scores candidate docs as
``numerator / denominator`` per matched feature, clamped to [0, 1],
aggregated across features per the feature strategy
(``Strut.java:202-218``: ``s[i] = numerators[i] / denominator``,
``score(...)`` folds per-feature scores; UNIT_WEIGHTED = plain sum).

Spark-first re-expression: the model is a tiny (term → weight) relation
— numerator = per-term answer-set doc count (ONE semi-join + groupBy,
the gatherFeatures shape), denominator = global df from the term-stats
table. Scoring is postings ⋈ broadcast(model) → groupBy(docint) →
sum(weight) → TakeOrderedAndProject top-k — the identical
index-only/broadcast/heap plan as BM25 serving, so it scales the same
way: the model is bounded (min-numerator floor) and broadcast; the
candidate set is index-driven, never a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex


def catwalk_model(
    index: InvertedIndex,
    answer_docs: DataFrame,
    min_numerator: int = 1,
) -> DataFrame:
    """(term, numerator, denominator, weight) — the cached model.

    numerator = #answer docs containing the term (gatherFeatures
    counts); denominator = global df (the reference's shared
    denominator); weight = numerator/denominator clamped to 1.0
    (Strut.java:207-210 clamps s[i] > 1.0f). ``min_numerator`` bounds
    the model size so it stays broadcastable at any corpus scale.
    """
    num = (
        index.postings.join(answer_docs, "docint", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("numerator"))
        .where(F.col("numerator") >= min_numerator)
    )
    return num.join(index.terms.select("term", "df"), "term").select(
        "term",
        "numerator",
        F.col("df").alias("denominator"),
        F.least(
            F.col("numerator") / F.col("df").cast("double"), F.lit(1.0)
        ).alias("weight"),
    )


#: Feature-fold strategies (Strategy.java:6-10, folded in
#: Strut.java:368-400 finalizeScore):
#:  - unit_weighted       Σ s[i]          (reference: Σ/|features|; the
#:                        divisor is a per-model constant, so the sum
#:                        form is rank-identical — we keep the sum)
#:  - regression_weighted Σ s[i]·scalar[i] (per-feature scalars from the
#:                        request — numeratorScalars via scaleScore)
#:  - max                 max s[i]·scalar[i]
STRATEGIES = ("unit_weighted", "regression_weighted", "max")


def strut_score(
    index: InvertedIndex,
    candidate_docs: DataFrame,
    model: DataFrame,
    k: int = 10,
    round_dp: int | None = None,
    strategy: str = "unit_weighted",
) -> DataFrame:
    """Top-k candidates by folded model-feature weight.

    ``strategy`` is one of STRATEGIES. For regression_weighted/max the
    ``model`` may carry a per-term ``scalar`` column (the reference's
    request-supplied numeratorScalars); absent, scalars default to 1.0.
    Every strategy is a one-aggregate switch over the same
    postings ⋈ broadcast(model) → groupBy(docint) plan, so the scale
    properties are identical across strategies.

    Output: (conv_id, turn_idx, docint, score) in
    (score desc, docint desc) order — the engine's standard tiebreak.
    ``round_dp`` rounds scores BEFORE ordering: strut scores are sums of
    identical small rationals, so exact cross-doc ties are common and
    float summation order would otherwise perturb the tiebreak
    (BM25-style continuous scores don't need this).
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"strategy must be one of {STRATEGIES}, got {strategy!r}")
    # the scalar multiplier belongs to regression_weighted/max ONLY
    # (Strut.java:368-400 applies numeratorScalars under those
    # strategies); unit_weighted must ignore a scalar column that
    # happens to ride on a shared model DataFrame
    use_scalar = strategy != "unit_weighted" and "scalar" in model.columns
    cols = ["term", "weight"] + (["scalar"] if use_scalar else [])
    contrib = (
        F.col("weight") * F.col("scalar") if use_scalar else F.col("weight")
    )
    agg = (F.max if strategy == "max" else F.sum)(contrib).alias("score")
    scored = (
        index.postings.join(candidate_docs, "docint", "left_semi")
        .join(F.broadcast(model.select(*cols)), "term")
        .groupBy("docint")
        .agg(agg)
    )
    if round_dp is not None:
        scored = scored.withColumn("score", F.round("score", round_dp))
    if index.tombstones is not None:
        scored = scored.join(
            index.tombstones.select("docint"), "docint", "left_anti"
        )
    meta = index.docs.select("docint", "conv_id", "turn_idx")
    return (
        scored.orderBy(F.desc("score"), F.desc("docint"))
        .limit(k)
        .join(meta, "docint")
        .orderBy(F.desc("score"), F.desc("docint"))
        .select("conv_id", "turn_idx", "docint", "score")
    )
