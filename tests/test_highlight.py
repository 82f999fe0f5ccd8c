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
