"""Waveform arrays with delta compression — reference parity for
Miru's analytics waveforms.

The reference answers analytics queries as per-term ``long[]`` waveforms
(time-bucketed cardinalities, ``miru-analytics-plugins/.../
Analytics.java:57-201``) and serializes them delta-coded (consecutive
bucket differences compress far better than raw counts under varint —
``AnalyticsAnswer`` waveform wire format). Spark-side the same shape is
a dense ``array<long>`` column per key:

- :func:`waveform_dense` — (key, array of counts over contiguous time
  buckets). One groupBy(key, bucket) agg (the only shuffle), then a
  bounded per-key ``map_from_entries`` + ``sequence`` fill — no Python,
  no window, no cross-key data movement. Array length = global bucket
  span, a broadcast scalar; per-key arrays are bounded by the time
  range, never by corpus size, so this holds at 100 TB exactly the way
  the reference's fixed-width waveforms do.
- :func:`delta_encode_col` / :func:`delta_decode_col` — pure column
  expressions (``transform`` with index / running ``aggregate``), so
  encode and decode both stay inside whole-stage codegen. Decode is the
  exact inverse (tested): ``decode(encode(a)) == a``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delta_encode_col(arr: Column) -> Column:
    """``[a0, a1-a0, a2-a1, ...]`` — the reference's waveform wire
    coding. Element 0 carries the absolute value."""
    return F.transform(
        arr,
        lambda x, i: F.when(i == F.lit(0), x).otherwise(
            # element_at is 1-based: element_at(arr, i) == arr[i-1]
            x
            - F.element_at(arr, i)
        ),
    )


def delta_decode_col(arr: Column) -> Column:
    """Running prefix sum — exact inverse of :func:`delta_encode_col`."""
    return F.aggregate(
        arr,
        F.expr("CAST(array() AS ARRAY<BIGINT>)"),
        lambda acc, x: F.concat(
            acc,
            # try_element_at: NULL (not an error) on the empty accumulator
            F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0).cast("long")) + x),
        ),
    )


def waveform_dense(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    unit: str = "day",
) -> DataFrame:
    """(key, counts array<long>) — dense waveform over contiguous
    ``unit`` buckets spanning the table's [min, max] time range.

    The bucket span comes from one tiny global agg broadcast to every
    key row; missing buckets fill with 0 (the reference's waveforms are
    likewise dense over the requested range)."""
    d = events.select(
        F.col(key_col).alias("key"), F.date_trunc(unit, ts_col).alias("b")
    )
    bounds = d.agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )  # 1 row, broadcast
    per = d.groupBy("key", "b").agg(F.count(F.lit(1)).alias("n"))
    secs = {"day": 86400, "hour": 3600, "minute": 60}[unit]
    j = per.crossJoin(F.broadcast(bounds)).withColumn(
        "idx",
        ((F.unix_timestamp("b") - F.unix_timestamp("b0")) / secs).cast("int"),
    )
    per_key = j.groupBy("key").agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "n"))).alias("m"),
        F.first(
            ((F.unix_timestamp("b1") - F.unix_timestamp("b0")) / secs).cast("int")
        ).alias("last_idx"),
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.col("last_idx")),
        # element_at on a MAP looks up by key — idx keys are 0-based
        lambda i: F.coalesce(F.element_at("m", i), F.lit(0).cast("long")),
    )
    return per_key.select(F.col("key"), counts.alias("counts"))


def waveform_delta(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    unit: str = "day",
) -> DataFrame:
    """Delta-coded waveform, exploded to (key, idx, delta) rows —
    the serialization-ready form, row-shaped for exact oracle checks."""
    dense = waveform_dense(events, key_col, ts_col, unit)
    enc = dense.select(
        "key", F.posexplode(delta_encode_col(F.col("counts"))).alias("idx", "delta")
    )
    return enc.select(
        F.col("key").alias(key_col), "idx", F.col("delta").cast("long").alias("delta")
    )


def value_percentiles(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` per key — the
    reference's latency-percentile shape (``RunningPercentile.java``,
    which drives MiruLowestLatencySolver's adaptive replica timeouts,
    ``MiruLowestLatencySolver.java:62-105``), computed exactly instead
    of via a ring buffer.

    Returns (key, p50, p95, p99, n) — one row per key. ONE shuffle on
    the key; ``percentile`` aggregates with map-side partial state
    (t-digest-free exact path: Spark buffers per-group values on the
    reducer, bounded by per-key row count — for unbounded keys switch
    to ``percentile_approx``, same call shape). Interpolation is the
    same linear rule as SQL ``quantile_cont`` / numpy 'linear', so the
    DuckDB oracle matches to float precision.
    """
    pcols = [
        F.percentile(value_col, F.lit(float(p))).alias(
            f"p{round(float(p) * 100):d}"
        )
        for p in ps
    ]
    return df.groupBy(key_col).agg(
        *pcols, F.count(F.lit(1)).alias("n")
    )
