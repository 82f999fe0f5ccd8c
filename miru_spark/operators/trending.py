"""Trending scoring strategies — reference parity for Miru's trending
plugin (enterstudio/miru ``miru-reco-plugins/.../trending/
TrendingInjectable.java:125-187``, ``TrendingQuery.java:16-18``).

The reference divides the query time range into N segments, builds a
per-term waveform (count of matching activities per segment,
``Analytics.java``), and ranks terms under four strategies:

- ``LINEAR_REGRESSION`` — OLS slope of (x_i = i/(N-1), y_i = count_i)
  over ALL buckets including zeros (``WaveformRegression.java:14-27``
  feeds every bucket into commons-math ``SimpleRegression``).
- ``LEADER`` — sum of the waveform (``TrendingInjectable.java:169-174``).
- ``PEAKS`` — number of local maxima found by Billauer's public-domain
  *peakdet* automaton (``PeakDet.java:45-81``) with trigger delta
  ``highestBucket/6 + bucket95/100``, where ``bucket95`` is the 95th
  percentile across terms of each term's highest bucket
  (``TrendingInjectable.java:126-140,176-179``). The reference uses
  commons-math ``Percentile`` (R-6: position p·(n+1) on the sorted
  sample) — :func:`_percentile_r6` reproduces it exactly and is the
  DEFAULT; ``percentile_estimator="r7"`` selects the SQL-standard
  linear interpolation (R-7, p·(n-1) — Spark ``percentile`` == DuckDB
  ``quantile_cont``) for SQL-ecosystem parity. The two differ at
  percentile boundaries on small/adversarial samples, which can flip
  rankings; the default is reference parity.
- ``HIGHEST_PEAK`` — max bucket (``TrendingInjectable.java:180-184``).

Spark-first shape: ONE groupBy(term, seg) count (the only data-sized
shuffle), a bounded per-term dense-array pivot (N is a query constant),
then every strategy is a pure column expression over the
``array<long>`` waveform — the peakdet state machine runs inside
``F.aggregate`` with a struct accumulator, i.e. JVM-side whole-stage
codegen, no Python, no window. Per-term state is O(N); the term-count
dimension is one shuffle — exactly the plan you want at 10^12 turns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STRATEGIES = ("LINEAR_REGRESSION", "LEADER", "PEAKS", "HIGHEST_PEAK")


def term_waveforms(
    postings: DataFrame,
    docs: DataFrame,
    n_segments: int = 16,
    ts_col: str = "ts",
) -> DataFrame:
    """(term, counts array<long>) — per-term dense waveform over
    ``n_segments`` equal time segments spanning the corpus [min, max]
    timestamp range (the reference's ``divideTimeRangeIntoNSegments``).

    ``postings`` is (term, docint[, ...]); ``docs`` carries (docint,
    ts). Counts are *documents containing the term* per segment (the
    analytics waveform counts activities, not term frequency).

    Segment index uses exact BIGINT math — ``((e - t0) * N) div
    (t1 - t0 + 1)`` — so any SQL engine reproduces the same bucketing
    bit-for-bit. Bounds come from one tiny global agg broadcast to all
    rows; the only data-sized shuffle is the (term, seg) count.
    """
    ep = F.col(ts_col).cast("timestamp").cast("long")
    d = docs.select("docint", ep.alias("e"))
    bounds = d.agg(F.min("e").alias("t0"), F.max("e").alias("t1"))  # 1 row
    seg = postings.select("term", "docint").join(d, "docint").crossJoin(
        F.broadcast(bounds)
    )
    seg = seg.withColumn(
        "seg",
        F.expr(f"((e - t0) * {int(n_segments)}) div (t1 - t0 + 1)").cast("int"),
    )
    per = seg.groupBy("term", "seg").agg(F.count(F.lit(1)).alias("n"))
    per_term = per.groupBy("term").agg(
        F.map_from_entries(F.collect_list(F.struct("seg", "n"))).alias("m")
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_segments) - 1)),
        lambda i: F.coalesce(F.element_at("m", i), F.lit(0).cast("long")),
    )
    return per_term.select("term", counts.alias("counts"))


def _sum_col(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")
    )


def _slope_col(arr: Column, n_segments: int) -> Column:
    """Closed-form OLS slope with x_i = i/(N-1) (WaveformRegression's
    normalized x axis): slope = (Σx·y − x̄·Σy) / Sxx, x̄ = 1/2 exactly,
    Sxx = Σx² − N/4 with Σx² = N(2N−1)/(6(N−1)). Pure column fold —
    identical math to SQL ``regr_slope(y, i/(N-1))``."""
    n = int(n_segments)
    if n < 2:
        return F.lit(None).cast("double")
    sum_y = _sum_col(arr)
    # Σ i·y, then /(N-1) to get Σ x·y
    sum_iy = F.aggregate(
        F.zip_with(
            arr,
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda y, i: y.cast("double") * i.cast("double"),
        ),
        F.lit(0).cast("double"),
        lambda acc, x: acc + x,
    )
    sxx = (n * (2 * n - 1)) / (6.0 * (n - 1)) - n / 4.0
    return (sum_iy / F.lit(float(n - 1)) - F.lit(0.5) * sum_y) / F.lit(sxx)


def _percentile_r6(sorted_arr: Column, p: float) -> Column:
    """Hyndman & Fan R-6 percentile over a SORTED array column —
    commons-math ``Percentile``'s default estimator (the reference's
    ``bucket95``): position ``pos = p·(n+1)`` on the 1-indexed sorted
    sample; below 1 → min, at/above n → max, else linear interpolation
    between floor(pos) and floor(pos)+1. Differs from R-7
    (``percentile``/``quantile_cont``, position p·(n−1)+1) at the
    boundaries — e.g. p=0.95, n=10: R-6 interpolates between the 10th
    and (clamped) max, R-7 between the 9th and 10th.

    Memory note: the caller aggregates the per-term maxima into one
    sorted array (one row). Spark's exact ``percentile`` agg buffers
    the same values internally, so this is the identical memory
    profile — O(vocabulary) doubles on one reducer, exactly what the
    reference's driver-side commons-math call holds."""
    n = F.size(sorted_arr)
    pos = F.lit(float(p)) * (n.cast("double") + F.lit(1.0))
    d = F.floor(pos).cast("int")
    frac = pos - d.cast("double")
    idx = F.greatest(F.least(d, n), F.lit(1))
    idx1 = F.greatest(F.least(d + 1, n), F.lit(1))
    lo = F.element_at(sorted_arr, idx)
    hi = F.element_at(sorted_arr, idx1)
    return (
        F.when(pos < F.lit(1.0), F.element_at(sorted_arr, 1))
        .when(pos >= n.cast("double"), F.element_at(sorted_arr, n))
        .otherwise(lo + frac * (hi - lo))
    )


def _bucket95_agg(per: DataFrame, estimator: str) -> DataFrame:
    """One-row (q) relation: the 95th percentile across terms of the
    per-term max bucket, under the chosen estimator."""
    if estimator == "r6":
        return per.agg(
            _percentile_r6(
                F.sort_array(F.collect_list("mx")), 0.95
            ).alias("q")
        )
    if estimator == "r7":
        return per.agg(F.expr("percentile(mx, 0.95)").alias("q"))
    raise ValueError(f"unknown percentile estimator {estimator!r}")


def _peaks_col(arr: Column, delta: Column) -> Column:
    """Billauer peakdet (public domain; translated from the published
    algorithm, semantics-identical to ``PeakDet.java:45-81``): count of
    local maxima that are followed by a drop of at least ``delta``.
    Runs as an ``F.aggregate`` struct-accumulator automaton — one
    left-to-right pass per array, inside codegen."""
    init = F.struct(
        F.lit(float("inf")).alias("mn"),
        F.lit(float("-inf")).alias("mx"),
        F.lit(1).alias("lf"),
        F.lit(0).cast("long").alias("np"),
    )

    def step(acc: Column, y: Column) -> Column:
        a = y.cast("double")
        mx1 = F.greatest(acc.mx, a)
        mn1 = F.least(acc.mn, a)
        peak = (acc.lf == 1) & (a < mx1 - delta)
        valley = (acc.lf == 0) & (a > mn1 + delta)
        return F.struct(
            F.when(peak, a).otherwise(mn1).alias("mn"),
            F.when(valley, a).otherwise(mx1).alias("mx"),
            F.when(acc.lf == 1, F.when(peak, 0).otherwise(1))
            .otherwise(F.when(valley, 1).otherwise(0))
            .alias("lf"),
            (acc.np + F.when(peak, 1).otherwise(0)).alias("np"),
        )

    return F.aggregate(arr, init, step, lambda acc: acc.np)


def trending(
    waveforms: DataFrame,
    strategy: str = "LINEAR_REGRESSION",
    k: int = 15,
    n_segments: int = 16,
    percentile_estimator: str = "r6",
) -> DataFrame:
    """Rank terms by ``strategy`` over their (term, counts) waveforms —
    the reference's per-strategy MinMaxPriorityQueue top-k
    (``TrendingInjectable.java:143-187``), as one TakeOrderedAndProject.

    Returns (term, score) — score rounded to 4 decimals, total order
    (score desc, term asc) so the top-k cut is deterministic. Terms
    with all-zero waveforms are excluded by construction (a term's
    waveform sums ≥ its df ≥ 1 — the reference's ``hasCounts`` gate).
    """
    strategy = strategy.upper()
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown trending strategy {strategy!r}; one of {STRATEGIES}")
    arr = F.col("counts")
    if strategy == "LEADER":
        scored = waveforms.select(
            "term", _sum_col(arr).cast("long").alias("score")
        )
    elif strategy == "HIGHEST_PEAK":
        scored = waveforms.select(
            "term", F.array_max(arr).cast("long").alias("score")
        )
    elif strategy == "LINEAR_REGRESSION":
        scored = waveforms.select(
            "term", F.round(_slope_col(arr, n_segments), 4).alias("score")
        )
    else:  # PEAKS
        per = waveforms.select(
            "term", arr.alias("counts"), F.array_max(arr).cast("double").alias("mx")
        )
        # bucket95: 95th percentile across terms of per-term max —
        # one tiny global agg, broadcast back
        # (TrendingInjectable.java:126-140); estimator r6 = commons-math
        # parity (default), r7 = SQL quantile_cont
        b95 = _bucket95_agg(per, percentile_estimator)
        per = per.crossJoin(F.broadcast(b95)).withColumn(
            "dlt", F.col("mx") / 6 + F.col("q") / 100
        )
        scored = per.select(
            "term", _peaks_col(F.col("counts"), F.col("dlt")).alias("score")
        )
    return scored.orderBy(F.desc("score"), F.asc("term")).limit(k)


def trending_multi(
    waveforms: DataFrame,
    strategies: tuple[str, ...] = STRATEGIES,
    k: int = 15,
    n_segments: int = 16,
    percentile_estimator: str = "r6",
) -> DataFrame:
    """(strategy, term, score) — per-strategy top-k for SEVERAL
    strategies computed in ONE pass over the waveform relation, the
    reference's keyed score-set shape (``TrendingQuery.scoreSets`` —
    one analytics answer feeds every requested strategy's heap,
    ``TrendingInjectable.java:143-187``).

    All four scores are column expressions over the same ``counts``
    array, so one projection evaluates them together (no per-strategy
    re-scan); ``stack`` unpivots to (strategy, score) rows and one
    window takes each strategy's top-k. Scores are doubles (slope
    rounded to 4dp; count-valued scores are exact integers in double).
    """
    from pyspark.sql import Window

    strategies = tuple(s.upper() for s in strategies)
    for s in strategies:
        if s not in STRATEGIES:
            raise ValueError(f"unknown trending strategy {s!r}")
    arr = F.col("counts")
    per = waveforms.select(
        "term", arr.alias("counts"), F.array_max(arr).cast("double").alias("mx")
    )
    exprs: dict[str, Column] = {}
    if "LEADER" in strategies:
        exprs["LEADER"] = _sum_col(arr)
    if "HIGHEST_PEAK" in strategies:
        exprs["HIGHEST_PEAK"] = F.col("mx")
    if "LINEAR_REGRESSION" in strategies:
        exprs["LINEAR_REGRESSION"] = F.round(_slope_col(arr, n_segments), 4)
    if "PEAKS" in strategies:
        b95 = _bucket95_agg(per, percentile_estimator)
        per = per.crossJoin(F.broadcast(b95))
        exprs["PEAKS"] = _peaks_col(
            F.col("counts"), F.col("mx") / 6 + F.col("q") / 100
        ).cast("double")
    stack_args = ", ".join(f"'{s}', `_s_{s}`" for s in strategies)
    scored = per.select(
        "term", *[v.alias(f"_s_{s}") for s, v in exprs.items()]
    ).selectExpr(
        "term",
        f"stack({len(strategies)}, {stack_args}) as (strategy, score)",
    )
    w = Window.partitionBy("strategy").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select("strategy", "term", "score")
        .orderBy("strategy", F.desc("score"), F.asc("term"))
    )
