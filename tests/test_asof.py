"""As-of temporal join (operators/asof.py) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from miru_spark.operators.asof import asof_join


def _frames(spark):
    probe = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 5, 50.0), (3, 9, 90.0)],
        "pid int, ts long, value double",
    ).withColumnRenamed("pid", "user_id")
    ref = spark.createDataFrame(
        [(1, 5, "a"), (1, 15, "b"), (1, 20, "c"), (2, 6, "d")],
        "rid int, ts long, tag string",
    ).withColumnRenamed("rid", "user_id")
    return probe, ref


def test_asof_latest_at_or_before(spark):
    probe, ref = _frames(spark)
    out = asof_join(probe, ref, on="user_id", payload_cols=["tag"]).orderBy(
        "user_id", "ts"
    )
    rows = [(r["user_id"], r["ts"], r["tag_ref"]) for r in out.collect()]
    # user 1 @10 -> 'a' (5); @20 -> 'c' (inclusive tie at 20, like DuckDB ASOF >=)
    # user 2 @5 has no ref at-or-before 6 -> dropped (inner); user 3 no refs
    assert rows == [(1, 10, "a"), (1, 20, "c")]


def test_asof_tolerance(spark):
    probe, ref = _frames(spark)
    out = asof_join(
        probe, ref, on="user_id", payload_cols=["tag"], tolerance=2
    )
    rows = [(r["user_id"], r["ts"], r["tag_ref"]) for r in out.collect()]
    # @10 matched 'a' at ts 5, age 5 > 2 -> dropped; @20 matched 'c' age 0
    assert rows == [(1, 20, "c")]


def test_asof_layout_invariant(spark):
    probe, ref = _frames(spark)
    a = asof_join(probe, ref, on="user_id", payload_cols=["tag"])
    b = asof_join(
        probe.repartition(7), ref.repartition(3), on="user_id",
        payload_cols=["tag"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_asof_equal_ts_refs_deterministic(spark):
    probe = spark.createDataFrame([(1, 10)], "user_id int, ts long")
    ref = spark.createDataFrame(
        [(1, 10, "x"), (1, 10, "z"), (1, 10, "y")],
        "user_id int, ts long, tag string",
    )
    outs = {
        asof_join(probe, ref.repartition(n), on="user_id", payload_cols=["tag"])
        .collect()[0]["tag_ref"]
        for n in (1, 2, 5)
    }
    # struct-max tiebreak: always the same winner regardless of layout
    assert outs == {"z"}


def test_range_join_window_edges(spark):
    from miru_spark.operators.asof import range_join

    probe = spark.createDataFrame(
        [(1, 100.0, "p1"), (1, 229.0, "p2")], "user_id int, ts double, pid string"
    )
    ref = spark.createDataFrame(
        # p1 window [40,100]: 40 in (inclusive lo), 39.999999 out,
        # 100 in (inclusive hi), 100.5 out. p2 window [169,229]: 170 in —
        # and it lives in bucket 2 while p2 is in bucket 3 (the straddle
        # the b-1 emission covers). Key 2 never matches.
        [(1, 40.0, "in_lo"), (1, 39.999999, "out_lo"), (1, 100.0, "in_hi"),
         (1, 100.5, "out_hi"), (1, 170.0, "in_prev_bucket"), (2, 90.0, "other_key")],
        "user_id int, ts double, tag string",
    )
    out = range_join(probe, ref, window_seconds=60.0, on="user_id")
    got = sorted((r["pid"], r["tag_ref"]) for r in out.collect())
    assert got == [("p1", "in_hi"), ("p1", "in_lo"), ("p2", "in_prev_bucket")]


def test_range_join_matches_naive(spark):
    from miru_spark.operators.asof import range_join

    probe = spark.range(0, 200).select(
        (F.col("id") % 7).cast("int").alias("user_id"),
        (F.col("id") * 3.7).alias("ts"),
        F.col("id").alias("pid"),
    )
    ref = spark.range(0, 300).select(
        (F.col("id") % 7).cast("int").alias("user_id"),
        (F.col("id") * 2.3).alias("ts"),
        F.col("id").alias("rid"),
    )
    fast = range_join(probe, ref, window_seconds=10.0, on="user_id")
    naive = (
        probe.alias("l")
        .join(ref.withColumnRenamed("ts", "rts").alias("r"), "user_id")
        .where((F.col("rts") >= F.col("ts") - 10.0) & (F.col("rts") <= F.col("ts")))
        .select("pid", F.col("rid").alias("rid_naive"))
    )
    a = sorted((r["pid"], r["rid_ref"]) for r in fast.collect())
    b = sorted((r["pid"], r["rid_naive"]) for r in naive.collect())
    assert a == b and len(a) > 0
