"""Per-locale analyzers (analyzers.py): three-engine parity and
index-build integration. Reference: TermAnalyzers.java:45-133."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from miru_spark.analyzers import (
    LOCALE_ANALYZERS,
    analyze_col,
    analyze_py,
    analyze_series,
    analyzer_for_locale,
    duckdb_analyze,
)

CASES = [
    "Tables and Chairs's classes status analysis DOGS cats bus",
    "Spark 数据处理引擎 fast ジョイン joins 조인 키",
    "mixed 中 single char runs 中文 ok",
    "  white   Space\tTokens KeepCase ",
    None,
    "",
    "it's users' 99s miss mass kiss",
    "日本語のテキスト解析",
    "한국어 형태소 분석기",
]

ANALYZERS = ["standard", "whitespace", "en", "cjk", "en_stop"]


@pytest.mark.parametrize("analyzer", ANALYZERS)
def test_three_engine_parity(spark, analyzer):
    """Spark Column, pure Python, and DuckDB SQL agree token-for-token."""
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    got_spark = [r[0] for r in df.select(analyze_col("text", analyzer)).collect()]
    got_py = [analyze_py(c, analyzer) for c in CASES]
    frag = duckdb_analyze("text", analyzer)
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"select coalesce({frag}, []) from (select ? as text)", [c]
        ).fetchone()[0]
        for c in CASES
    ]
    assert got_spark == got_py == got_duck


def test_en_minimal_stem_rules():
    """EnglishMinimalStemFilter rule set: strip final s from len>=4
    tokens unless the prior char is s/u/i."""
    assert analyze_py("tables joins dogs", "en") == ["table", "join", "dog"]
    # protected endings: ss, us, is
    assert analyze_py("class status analysis", "en") == [
        "class",
        "status",
        "analysis",
    ]
    # too short to stem
    assert analyze_py("bus gas is as", "en") == ["bus", "gas", "is", "as"]


def test_cjk_bigrams():
    got = analyze_py("中文处理", "cjk")
    assert got == ["中文", "文处", "处理"]
    # single-char run -> unigram; latin interleaves as standard tokens
    assert analyze_py("ab 中 cd", "cjk") == ["ab", "cd", "中"]
    # hangul + hiragana runs bigram independently
    assert analyze_py("조인 키", "cjk") == ["조인", "키"]


def test_en_stopwords():
    got = analyze_py("the tables are in a fast index", "en_stop")
    assert got == ["table", "fast", "index"]


def test_whitespace_preserves_case():
    assert analyze_py("Keep CASE intact-ish", "whitespace") == [
        "Keep",
        "CASE",
        "intact-ish",
    ]


def test_locale_registry():
    assert analyzer_for_locale("en") == "en"
    for loc in ("zh", "ja", "ko"):
        assert analyzer_for_locale(loc) == "cjk"
    assert analyzer_for_locale("de") == "standard"
    assert analyzer_for_locale(None) == "standard"
    assert set(LOCALE_ANALYZERS.values()) <= set(ANALYZERS)


def test_analyze_series_matches_py():
    s = pd.Series(CASES)
    assert list(analyze_series(s, "cjk")) == [analyze_py(c, "cjk") for c in CASES]


def test_unknown_analyzer_raises():
    with pytest.raises(ValueError):
        analyze_py("x", "nope")
    with pytest.raises(ValueError):
        duckdb_analyze("x", "nope")


def test_index_build_with_analyzer(spark):
    """An index built with the en analyzer serves stemmed terms: a
    query for 'join' matches docs that only contain 'joins'."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search

    rows = [
        ("c0", 0, "user", "joins tables quickly", "t", 1000),
        ("c0", 1, "assistant", "the join plan", "t", 2000),
        ("c1", 0, "user", "nothing relevant here", "t", 3000),
    ]
    from pyspark.sql import functions as F

    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    idx = InvertedIndex.build(turns, positions=False, analyzer="en")
    got = {
        (r["conv_id"], r["turn_idx"])
        for r in search(idx, "join", k=10).collect()
    }
    assert got == {("c0", 0), ("c0", 1)}
    # standard-analyzed index only matches the exact surface form
    idx_std = InvertedIndex.build(turns, positions=False)
    got_std = {
        (r["conv_id"], r["turn_idx"])
        for r in search(idx_std, "join", k=10).collect()
    }
    assert got_std == {("c0", 1)}
