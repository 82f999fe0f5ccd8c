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
    # breadth-spec scripts (round 3): every sample runs through EVERY
    # analyzer below, so cross-script inputs also prove each tokenizer
    # ignores out-of-class codepoints identically in all three engines.
    "De snelle bruine vossen springen over de luie honden en huisjes",
    "De snabba bruna rävarna hoppar över de lata hundarna i husen",
    "Vulpile maro rapide sar peste câinii leneși prin orașele mari",
    "Rychlé hnědé lišky skáčou přes líné psy ve velkých městech",
    # NB: no İ here — dotted-capital-I lowercases to i+combining-dot in
    # the JVM/CPython but plain i in DuckDB, so İ text is only
    # parity-stable under the tr analyzer (whose pre-rule strips the
    # dot); see test_breadth_spec_stems.
    "Hızlı kahverengi tilkiler tembel köpeklerin üzerinden atlarlar",
    "Быстрые коричневые ЛИСЫ прыгают через ленивых собаками в городах",
    "Οι γρήγορες καφέ ΑΛΕΠΟΥΔΕΣ πηδούν πάνω από τεμπέληδες σκύλους",
    "तेज़ भूरी लोमड़ियों ने आलसी कुत्तों के ऊपर छलांग लगाई",
    "Արագ շագանակագույն ԱՂՎԵՍՆԵՐԸ ցատկում են ծույլ շների վրայով",
    "الثعالبُ البنيةُ السريعةُ تقفزُ فوقَ الكلابِ الكسولةِ في المدينة",
    "روباه‌های قهوه‌ای سریع از روی سگ‌های تنبل می‌پرند در شهرها",
    "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้าม the lazy dogs ก",
]

ANALYZERS = [
    "standard", "whitespace", "en", "cjk",
    "fr", "de", "es", "it", "pt",
    "en_stop", "fr_stop", "de_stop", "es_stop", "it_stop", "pt_stop",
    # round-3 breadth specs (full reference registry)
    "nl", "da", "sv", "no", "ro", "ca", "gl", "id", "eu", "fi", "cs",
    "lv", "tr", "ru", "bg", "gr", "hi", "hy", "ar", "fa", "thai",
    "nl_stop", "da_stop", "sv_stop", "ru_stop",
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
    assert analyzer_for_locale("xx") == "standard"  # unregistered locale
    assert analyzer_for_locale(None) == "standard"
    assert set(LOCALE_ANALYZERS.values()) <= set(ANALYZERS)
    # the COMPLETE reference registry (TermAnalyzers.java:53-99): every
    # locale key the reference registers resolves to a non-standard,
    # locale-appropriate analyzer here too.
    reference_locales = {
        "ar", "bg", "ca", "cs", "en", "en_ie", "es", "eu", "da", "de",
        "fa", "fi", "fr", "gl", "gr", "hi", "hy", "id", "it", "ku",
        "lv", "nl", "nb", "nn", "pt", "pt_br", "ro", "ru", "sv", "th",
        "tr", "zh", "ja", "ko",
    }
    for loc in reference_locales:
        assert analyzer_for_locale(loc) != "standard", loc
    assert set(LOCALE_ANALYZERS) == reference_locales
    # shared-analyzer mappings mirror the reference's shared instances
    assert analyzer_for_locale("nb") == analyzer_for_locale("nn") == "no"
    assert analyzer_for_locale("ku") == "fa"  # Sorani: Perso-Arabic script
    assert analyzer_for_locale("th") == "thai"


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
    # cjk has no stopword set: flag is a no-op
    assert analyzer_for_locale("zh", use_stopwords=True) == "cjk"
    # round-3 breadth sets
    assert analyzer_for_locale("ru", use_stopwords=True) == "ru_stop"
    assert analyzer_for_locale("nl", use_stopwords=True) == "nl_stop"
    # a spec analyzer without a stopword set: flag is a no-op
    assert analyzer_for_locale("gr", use_stopwords=True) == "gr"


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


def test_breadth_spec_stems():
    """Spot rules for the round-3 spec analyzers (one inflected →
    stemmed expectation per language, matching the Lucene light/minimal
    stemmer each spec approximates)."""
    assert analyze_py("huisjes honden", "nl") == ["huis", "hond"]
    assert analyze_py("husene hundene", "da") == ["hus", "hund"]
    assert analyze_py("rävarna hundarna husen", "sv") == ["räv", "hund", "hus"]
    assert analyze_py("hundene revene", "no") == ["hund", "rev"]
    assert analyze_py("orașele vulpile", "ro") == ["oraș", "vulpi"]
    assert analyze_py("guineus mandrosos", "ca") == ["guineu", "mandroso"]
    assert analyze_py("raposos cans", "gl") == ["raposo", "can"]
    assert analyze_py("anjingnya melompatkah", "id") == ["anjing", "melompat"]
    assert analyze_py("taloissa koirien hyppäävät", "fi") == [
        "talo", "koiri", "hyppäävä",
    ]
    assert analyze_py("městech lišky", "cs") == ["měst", "lišk"]
    assert analyze_py("pilsētās lapsas", "lv") == ["pilsētā", "laps"]
    # tr: -lar/-ler plural + genitive; İ lowercases to i+combining-dot
    # in the JVM and CPython but plain i in DuckDB — the dot-strip
    # pre-rule makes all three produce 'istanbul'
    assert analyze_py("TİLKİLER köpeklerin İstanbul", "tr") == [
        "tilki", "köpek", "istanbul",
    ]
    assert analyze_py("собаками городах лисы", "ru") == ["собак", "город", "лис"]
    assert analyze_py("градовете лисиците", "bg") == ["град", "лисиц"]
    # gr: final sigma normalized to σ BEFORE suffix strip (also papers
    # over DuckDB's simple-mapping lower of final Σ)
    assert analyze_py("ΑΛΕΠΟΥΔΕΣ σκύλους", "gr") == ["αλεπουδ", "σκύλ"]
    assert analyze_py("लोमड़ियों कुत्तों", "hi") == ["लोमड़िय", "कुत्त"]
    assert analyze_py("ԱՂՎԵՍՆԵՐԸ քաղաքներում", "hy") == ["աղվես", "քաղաք"]
    # ar: tashkeel stripped, definite article stripped, alef folded
    assert analyze_py("الثعالبُ أرنب", "ar") == ["ثعالب", "ارنب"]
    # fa: ZWNJ splits tokens; ها plural stripped; arabic yeh folded
    assert analyze_py("شهرها كتاب", "fa") == ["شهر", "کتاب"]
    # thai: character bigrams over thai runs, latin as standard tokens
    assert analyze_py("ก ไทย ok", "thai") == ["ok", "ก", "ไท", "ทย"]


def test_breadth_stopword_sets():
    """Surface-form stopword lists folded through their own analyzer at
    import time: filtering happens on post-analysis forms."""
    assert analyze_py("de snelle vossen", "nl_stop") == ["snell", "voss"]
    assert analyze_py("och rävarna i husen", "sv_stop") == ["räv", "hus"]
    assert analyze_py("og hundene i husene", "da_stop") == ["hund", "hus"]
    assert analyze_py("и лисы в городах", "ru_stop") == ["лис", "город"]


def test_locale_stopword_sets_post_stem():
    """Stopword filtering runs after stemming, so the sets hold
    post-stem forms ('dans'→'dan', 'eine'→'ein', 'sono'→'son')."""
    assert analyze_py("dans les maisons", "fr_stop") == ["maison"]
    assert analyze_py("eine ohne Häuser", "de_stop") == ["häus"]
    assert analyze_py("las casas unos", "es_stop") == ["casa"]
    assert analyze_py("sono le case", "it_stop") == ["cas"]
    # 'são' (ser conjugation) is gated by the full-depth pt list
    assert analyze_py("as casas não são", "pt_stop") == ["casa"]


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
