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
    # accented latin across the European analyzers
    "Les Tables données Élèves dans les maisons aux prix",
    "Die Häuser sind GRÖSSER und grün, ohne Dächer",
    "las casas unos niños grandes señores",
    "le case sono belle e questo libro è còrso",
    "as casas não são uns meses alugadas",
    "straße STRASSE façade Ça",
]

ANALYZERS = [
    "standard", "whitespace", "en", "cjk",
    "fr", "de", "es", "it", "pt",
    "en_stop", "fr_stop", "de_stop", "es_stop", "it_stop", "pt_stop",
]


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
    for loc in ("fr", "de", "es", "it", "pt"):
        assert analyzer_for_locale(loc) == loc
    assert analyzer_for_locale("ru") == "standard"  # unregistered locale
    assert analyzer_for_locale(None) == "standard"
    assert set(LOCALE_ANALYZERS.values()) <= set(ANALYZERS)


def test_locale_fallback_walks_prefixes():
    """TermAnalyzers.findAnalyzer:121-133: full code first, then the
    prefix before the first '_' — pt_BR → pt, en-IE → en."""
    assert analyzer_for_locale("pt_BR") == "pt"
    assert analyzer_for_locale("pt-br") == "pt"
    assert analyzer_for_locale("en_IE") == "en"
    assert analyzer_for_locale("en_US_posix") == "en"
    assert analyzer_for_locale("xx_YY") == "standard"


def test_use_stopwords_toggle():
    """The reference's findAnalyzer(locale, useStopWords) flag."""
    assert analyzer_for_locale("fr", use_stopwords=True) == "fr_stop"
    assert analyzer_for_locale("pt_BR", use_stopwords=True) == "pt_stop"
    # cjk/standard have no stopword set: flag is a no-op
    assert analyzer_for_locale("zh", use_stopwords=True) == "cjk"
    assert analyzer_for_locale("ru", use_stopwords=True) == "standard"


def test_european_minimal_stems():
    """One spot rule per language (single-pass shortest-suffix strip)."""
    # fr: -s/-x off len>=4 stems, s/u/i/x-protected
    assert analyze_py("tables dans aux maisons prix", "fr") == [
        "table", "dan", "aux", "maison", "prix",
    ]
    # de: strips the shortest set-suffix the word ends with ('häuser'
    # ends 'r'∉set, then 'er'∈set → 'häus'); accents survive tokenization
    # ('grün'→'grü' is Lucene GermanMinimalStemFilter behavior too: its
    # len>3 tier strips final e/n/s)
    assert analyze_py("Häuser haben eine ohne grün", "de") == [
        "häus", "habe", "ein", "ohn", "grü",
    ]
    # es: plural -s (shortest suffix wins over -es)
    assert analyze_py("casas niños grandes señores", "es") == [
        "casa", "niño", "grande", "señore",
    ]
    # it: final-vowel strip, len>=4
    assert analyze_py("case sono belle questo", "it") == [
        "cas", "son", "bell", "quest",
    ]
    # pt: plural strip, accents preserved ('não' too short to stem)
    assert analyze_py("casas não meses alugadas", "pt") == [
        "casa", "não", "mese", "alugada",
    ]


def test_locale_stopword_sets_post_stem():
    """Stopword filtering runs after stemming, so the sets hold
    post-stem forms ('dans'→'dan', 'eine'→'ein', 'sono'→'son')."""
    assert analyze_py("dans les maisons", "fr_stop") == ["maison"]
    assert analyze_py("eine ohne Häuser", "de_stop") == ["häus"]
    assert analyze_py("las casas unos", "es_stop") == ["casa"]
    assert analyze_py("sono le case", "it_stop") == ["cas"]
    assert analyze_py("as casas não são", "pt_stop") == ["casa", "são"]


def test_analyze_series_matches_py():
    s = pd.Series(CASES)
    assert list(analyze_series(s, "cjk")) == [analyze_py(c, "cjk") for c in CASES]


def test_unknown_analyzer_raises():
    with pytest.raises(ValueError):
        analyze_py("x", "nope")
    with pytest.raises(ValueError):
        duckdb_analyze("x", "nope")


def test_query_analyzed_like_index(spark):
    """Query strings run through the INDEX's analyzer (the reference's
    TermTokenizer applies the field analyzer to query strings): 'joins'
    must hit an en index whose postings hold the stem 'join'; a French
    plural query must hit the stemmed French postings; the analyzer
    round-trips through save/load."""
    from pyspark.sql import functions as F

    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search
    from miru_spark.query.parser import analyze_node, parse_query

    rows = [
        ("c0", 0, "user", "the join plans", "t", 1000),
        ("c1", 0, "user", "les maisons anciennes", "t", 2000),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    idx_en = InvertedIndex.build(turns, positions=False, analyzer="en")
    # inflected query form matches the stemmed posting
    assert search(idx_en, "joins AND plan", k=5).count() == 1
    assert search(idx_en, "plans", k=5).count() == 1

    idx_fr = InvertedIndex.build(turns, positions=False, analyzer="fr")
    assert search(idx_fr, "maison AND ancienne", k=5).count() == 1
    # metadata fields stay keyword (unanalyzed)
    assert search(idx_fr, "maisons AND role:user", k=5).count() == 1

    # analyze_node edges: multi-token CJK expansion -> And; patterns bypass
    from miru_spark.query.ast import And, Prefix, Term

    n = analyze_node(Term("中文处"), "cjk")
    assert isinstance(n, And) and {c.value for c in n.children} == {"中文", "文处"}
    assert analyze_node(Prefix("maison"), "fr") == Prefix("maison")
    # parse-time application is single-shot (stemmers are not idempotent)
    assert parse_query("dans", "fr") == Term("dan")


def test_analyzer_roundtrips_meta(spark, tmp_path):
    from pyspark.sql import functions as F

    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search

    rows = [("c0", 0, "user", "les maisons anciennes", "t", 1000)]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    idx = InvertedIndex.build_persisted(
        turns, str(tmp_path / "seg"), analyzer="fr"
    )
    assert idx.analyzer == "fr"
    re = InvertedIndex.load(spark, str(tmp_path / "seg"))
    assert re.analyzer == "fr"
    assert search(re, "maison", k=5).count() == 1


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
