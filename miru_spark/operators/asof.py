"""As-of (temporal) join: each probe row matched to the latest
reference row at-or-before its timestamp, per key.

The reference engine's time index answers exactly this probe shape for
a single stream — ``LabTimeIndex.getClosestId`` binary-searches the
monotonic (timestamp ↔ docId) map to the newest id at-or-before a
bound (``miru-service/.../index/lab/LabTimeIndex.java:187-227``, used
by the waveform bucketizer and the time-range mask). This operator is
the two-stream generalization every event/feature pipeline needs:
attach the most recent prior state (click, price, sensor reading) to
each event without an equi-join key on time.

Spark-first plan (no ``crossJoin``, no per-row lookup, no UDF):

1. union probe + reference rows with a side marker, reference payload
   as one struct column (null on probe rows);
2. ONE window per key ordered by (ts, side) with a running
   ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame — a streaming frame Spark evaluates in O(rows) without
   buffering the partition;
3. keep probe rows, unpack the carried payload.

One shuffle total (the window's hash partition on the key), identical
cost shape to a co-partitioned merge join. Keys are users/entities —
cardinality in the millions at 100 TB, so the partition count scales
with the data, and a hot key degrades to a per-key linear scan, never
a quadratic pair blowup. Inclusive semantics (reference.ts == probe.ts
matches) — the same bound DuckDB's ``ASOF JOIN ... >=`` uses, which is
the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    suffix: str = "_ref",
    tolerance=None,
) -> DataFrame:
    """Inner as-of join: probe rows that have a reference row
    at-or-before their ``ts_col`` on the same ``on`` key, with the
    latest such reference's ``payload_cols`` appended as
    ``<col><suffix>``.

    ``tolerance`` (optional, same type arithmetic as ``ts_col`` -
    e.g. a ``INTERVAL`` string for timestamps) drops matches older
    than ``probe.ts - tolerance``.
    """
    payload_cols = payload_cols or [
        c for c in reference.columns if c not in (on,)
    ]
    if ts_col not in payload_cols:
        payload_cols = [*payload_cols, ts_col]

    pay = F.struct(*[F.col(c) for c in payload_cols])
    r = reference.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        pay.alias("_pay"),
        F.lit(0).alias("_side"),
    )
    probe_cols = probe.columns
    p = probe.select(
        *probe_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        F.lit(1).alias("_side"),
    )
    u = p.unionByName(r, allowMissingColumns=True)

    # side 0 sorts before side 1 at equal ts => inclusive (ref.ts <= probe.ts);
    # the ORDERABLE payload fields as the final key make the winner among
    # equal-ts reference rows deterministic (struct ordering = max payload).
    # Map-typed payload columns can ride along in _pay but can't sort.
    from pyspark.sql.types import MapType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if hasattr(dt, "elementType"):
            return _orderable(dt.elementType)
        if hasattr(dt, "fields"):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    tie_cols = [
        F.col(f"_pay.{f.name}")
        for f in r.schema["_pay"].dataType.fields
        if _orderable(f.dataType)
    ]
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side", *tie_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
    out = carried.where((F.col("_side") == 1) & F.col("_m").isNotNull())
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else F.lit(tolerance)
        out = out.where(F.col(f"_m.{ts_col}") >= F.col("_ts") - tol)
    sel = [F.col(c) for c in probe_cols]
    sel += [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload_cols]
    return out.select(*sel)


def range_join(
    probe: DataFrame,
    reference: DataFrame,
    window_seconds: float,
    on: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Interval join: pair each probe row with EVERY reference row of
    the same key inside ``[probe.ts - window, probe.ts]`` (inclusive).

    The naive plan is a theta-join Spark can only execute as a
    broadcast-nested-loop or cartesian product — the all-pairs
    anti-pattern. This is the bucketed rewrite every streaming engine
    uses for interval joins: quantize time into window-sized buckets,
    emit each reference row under its own bucket AND the next one (a
    probe's window can only span those two), equi-join on
    ``(key, bucket)``, then apply the exact range predicate. Join
    fan-in per task is bounded by (key, 2·window) density — linear in
    matching pairs, never quadratic in the corpus; one shuffle keyed on
    ``(key, bucket)``.

    Returns probe columns + the matched reference row's non-key columns
    suffixed ``_ref`` (inner semantics: unmatched probes drop out).

    Exact for timestamp/timestamp_ntz columns (integer epoch micros) and
    integer-second columns. Fractional-second DOUBLE inputs keep their
    full precision in the range predicate (no quantization), with a
    theoretical 1-ULP bucket-assignment edge at exact window boundaries
    (~2^-53 relative) — irrelevant in practice and absent for the
    timestamp path.
    """
    us = int(round(window_seconds * 1_000_000))
    if us <= 0:
        raise ValueError(
            f"window_seconds={window_seconds!r} must be at least 1 microsecond"
        )

    def _to_us(frame, c):
        # timestamp/timestamp_ntz -> exact epoch micros; numeric seconds
        # stay DOUBLE (no quantization — the exact range predicate below
        # must see the original values, not micros truncated to long)
        dt = dict(frame.dtypes)[ts_col]
        if dt.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("double") * F.lit(1_000_000.0)

    p = probe.withColumn("_pts", _to_us(probe, F.col(ts_col))).withColumn(
        "_bkt", F.floor(F.col("_pts") / F.lit(us))
    )
    ref_cols = [c for c in reference.columns if c != on]
    r = (
        reference.withColumn("_rts", _to_us(reference, F.col(ts_col)))
        .withColumn("_rbkt", F.floor(F.col("_rts") / F.lit(us)))
        # a probe in bucket b can reach reference rows in b and b-1
        .withColumn("_bkt", F.explode(F.array(F.col("_rbkt"), F.col("_rbkt") + 1)))
        .select(
            F.col(on),
            "_bkt",
            "_rts",
            *[F.col(c).alias(f"{c}_ref") for c in ref_cols],
        )
    )
    joined = p.join(r, [on, "_bkt"]).where(
        (F.col("_rts") >= F.col("_pts") - F.lit(us)) & (F.col("_rts") <= F.col("_pts"))
    )
    return joined.drop("_pts", "_bkt", "_rts")
