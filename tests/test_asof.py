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
