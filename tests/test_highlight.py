"""Snippet/highlight extraction (reference LuceneBackedQueryParser
.highlight:56-74 — ours is tag-wrapping over the analyzed stream)."""

from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.bm25 import search
from miru_spark.query.highlight import with_snippets


def test_snippets(spark):
    rows = [
        ("c0", 0, "user", "aaa bbb ccc target ddd eee fff", None),
        ("c1", 0, "user", "no match here at all", None),
        ("c1", 1, "user", "Target! at the start", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    idx = InvertedIndex.build(df)
    res = search(idx, "target", k=5)
    out = with_snippets(idx, res, "target", window=2).toPandas()
    assert len(out) == 2
    by_conv = {r.conv_id: r.snippet for r in out.itertuples()}
    assert by_conv["c0"] == "bbb ccc <b>target</b> ddd eee"
    assert by_conv["c1"].startswith("<b>target</b> at the")


def test_snippets_prefix_query(spark):
    rows = [("c0", 0, "user", "xx yy targeting zz ww", None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    idx = InvertedIndex.build(df)
    res = search(idx, "targ*", k=5)
    out = with_snippets(idx, res, "targ*", window=1).toPandas()
    assert out.iloc[0]["snippet"] == "yy <b>targeting</b> zz"


def test_snippets_stemmed_and_nonlatin(spark):
    """The highlighter parses with the INDEX's analyzer and matches
    display tokens by analyzed form: query 'joins' on an 'en' index
    (minimal plural stemmer) highlights surface 'joins' — the exact
    set of surface forms that match in the index — and NOT 'joint' or
    'joining' (neither stems to 'join' under EnglishMinimalStem rules);
    a ru index highlights Cyrillic surface forms (crashed pre-fix: the
    default standard analyzer rejected non-latin query terms)."""
    rows = [
        ("c0", 0, "user", "she joins the joining team joint effort", None),
        ("c1", 0, "user", "хитрые лисы в лесу", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())

    en = InvertedIndex.build(df.where("conv_id = 'c0'"), analyzer="en")
    out = with_snippets(
        en, search(en, "joins", k=5), "joins", window=8
    ).toPandas()
    snip = out.iloc[0]["snippet"]
    assert "<b>joins</b>" in snip
    assert "<b>joining</b>" not in snip and "<b>joint</b>" not in snip

    ru = InvertedIndex.build(df.where("conv_id = 'c1'"), analyzer="ru")
    out = with_snippets(
        ru, search(ru, "лисы", k=5), "лисы", window=8
    ).toPandas()
    assert "<b>лисы</b>" in out.iloc[0]["snippet"]
