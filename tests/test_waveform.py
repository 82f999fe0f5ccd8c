"""Waveform delta coding (operators/waveform.py): encode/decode are
exact inverses, and the dense builder matches a pandas oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from miru_spark.operators.waveform import (
    delta_decode_col,
    delta_encode_col,
    waveform_dense,
    waveform_delta,
)

ARRS = [
    [5, 5, 5, 5],
    [0, 0, 0],
    [3],
    [],
    [10, 0, 0, 7, 1, 1, 1],
    [1, 2, 3, 4, 5],
]


def test_delta_roundtrip(spark):
    df = spark.createDataFrame([(a,) for a in ARRS], "arr array<bigint>")
    out = df.select(
        "arr", delta_decode_col(delta_encode_col(F.col("arr"))).alias("back")
    ).collect()
    for r in out:
        assert r["back"] == r["arr"]


def test_delta_encode_values(spark):
    df = spark.createDataFrame([([10, 12, 12, 9],)], "arr array<bigint>")
    got = df.select(delta_encode_col(F.col("arr"))).collect()[0][0]
    assert got == [10, 2, 0, -3]


def _events(spark):
    rows = [
        ("click", "2024-03-01 10:00:00"),
        ("click", "2024-03-01 23:59:00"),
        ("click", "2024-03-03 00:00:01"),
        ("view", "2024-03-02 05:00:00"),
        ("view", "2024-03-04 12:00:00"),
    ]
    return spark.createDataFrame(rows, "event_type string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_waveform_dense(spark):
    got = {
        r["key"]: r["counts"]
        for r in waveform_dense(_events(spark), unit="day").collect()
    }
    # span 2024-03-01 .. 2024-03-04 -> 4 buckets, dense with zero fill
    assert got == {"click": [2, 0, 1, 0], "view": [0, 1, 0, 1]}


def test_waveform_delta_rows_match_pandas(spark):
    got = (
        waveform_delta(_events(spark), unit="day")
        .toPandas()
        .sort_values(["event_type", "idx"])
        .reset_index(drop=True)
    )
    dense = {"click": [2, 0, 1, 0], "view": [0, 1, 0, 1]}
    exp_rows = []
    for k, arr in sorted(dense.items()):
        prev = 0
        for i, x in enumerate(arr):
            exp_rows.append((k, i, x - prev))
            prev = x
    exp = pd.DataFrame(exp_rows, columns=["event_type", "idx", "delta"])
    assert got.astype({"idx": int, "delta": int}).equals(
        exp.astype({"idx": int, "delta": int})
    )


def test_value_percentiles_matches_numpy(spark):
    import numpy as np

    from miru_spark.operators.waveform import value_percentiles

    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v * v)) for v in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"], r["n"])
        for r in value_percentiles(df).collect()
    }
    for key, vals in (("a", range(1, 101)), ("b", [v * v for v in range(1, 8)])):
        arr = np.array(list(vals), dtype=float)
        exp = np.percentile(arr, [50, 95, 99], method="linear")
        assert got[key][3] == len(arr)
        for g, e in zip(got[key][:3], exp):
            assert abs(g - e) < 1e-9, (key, g, e)
