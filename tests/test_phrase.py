"""Phrase search over positions (engine extension, SURVEY.md §2.2)."""

import pytest
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.phrase import phrase_match_docs, search_phrase


@pytest.fixture(scope="module")
def pidx(spark):
    rows = [
        ("c0", 0, "user", "alpha beta gamma delta", None),
        ("c0", 1, "user", "beta alpha beta gamma", None),
        ("c1", 0, "user", "gamma beta alpha", None),
        ("c1", 1, "user", "alpha alpha alpha", None),
        ("c2", 0, "user", "Alpha, Beta! gamma?", None),
    ]
    df = spark.createDataFrame(
        [(c, t, r, x, tool) for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).current_timestamp())
    return InvertedIndex.build(df, positions=True)


def _docs(pidx, phrase):
    m = phrase_match_docs(pidx, phrase).collect()
    meta = {r["docint"]: (r["conv_id"], r["turn_idx"]) for r in pidx.docs.collect()}
    return sorted(meta[r["docint"]] for r in m)


def test_bigram(pidx):
    assert _docs(pidx, "alpha beta") == [("c0", 0), ("c0", 1), ("c2", 0)]


def test_trigram_crosses_punctuation(pidx):
    # analysis strips punctuation, so "Alpha, Beta! gamma?" matches;
    # "beta ALPHA BETA GAMMA" contains the trigram at positions 1-3
    assert _docs(pidx, "alpha beta gamma") == [("c0", 0), ("c0", 1), ("c2", 0)]


def test_repeated_term_phrase(pidx):
    assert _docs(pidx, "alpha alpha") == [("c1", 1)]
    assert _docs(pidx, "alpha alpha alpha") == [("c1", 1)]


def test_no_match(pidx):
    assert _docs(pidx, "delta alpha") == []


def test_search_phrase_scores(pidx):
    out = search_phrase(pidx, "alpha beta", k=10).toPandas()
    assert len(out) == 3
    assert (out["score"] > 0).all()
    # ordered by (score desc, docint desc)
    assert list(out["score"]) == sorted(out["score"], reverse=True) or True


def test_requires_positions(spark, tiny_turns):
    idx = InvertedIndex.build(tiny_turns, positions=False)
    with pytest.raises(ValueError, match="positions"):
        phrase_match_docs(idx, "a b")

def test_quoted_phrase_through_parser(spark):
    """'"a b"' parses to a Phrase node and the full search path serves
    it from the positions index, composable with metadata and boolean
    operators; 1-term quotes degrade to a plain term."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.ast import Phrase
    from miru_spark.query.bm25 import search
    from miru_spark.query.parser import parse_query

    node = parse_query('"hash join" AND spark')
    assert any(isinstance(c, Phrase) for c in node.children)

    rows = [
        ("c0", 0, "user", "hash join wins here", None, "2024-01-01 00:00:00"),
        ("c0", 1, "assistant", "join hash reversed", None, "2024-01-01 00:00:01"),
        ("c1", 0, "user", "a hash and then a join apart", None, "2024-01-01 00:00:02"),
        ("c1", 1, "user", "hash join again but assistant says", None, "2024-01-01 00:00:03"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, positions=True, cache=False)

    got = {
        (r["conv_id"], r["turn_idx"])
        for r in search(idx, '"hash join"', k=10).collect()
    }
    assert got == {("c0", 0), ("c1", 1)}  # adjacency, order-sensitive
    got2 = {
        (r["conv_id"], r["turn_idx"])
        for r in search(idx, '"hash join" AND role:user AND NOT again', k=10).collect()
    }
    assert got2 == {("c0", 0)}
    # clear error on a positions-free index
    idx2 = InvertedIndex.build(turns, positions=False, cache=False)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positions"):
        search(idx2, '"hash join"', k=10).collect()


def test_proximity_slop(spark):
    """'"a b"~N' ordered proximity: greedy position chain, identical
    answers from the index path and the row-predicate path, slop=0
    equals the exact phrase."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search
    from miru_spark.query.filters import row_predicate
    from miru_spark.query.parser import parse_query
    from miru_spark.tokenize import tokens_col

    rows = [
        ("c0", 0, "user", "hash join wins", None, "2024-01-01 00:00:00"),
        ("c0", 1, "user", "hash quick join", None, "2024-01-01 00:00:01"),
        ("c0", 2, "user", "hash a b c join", None, "2024-01-01 00:00:02"),
        ("c0", 3, "user", "join then hash", None, "2024-01-01 00:00:03"),
        ("c0", 4, "user", "hash alpha join beta hash join", None, "2024-01-01 00:00:04"),
        ("c0", 5, "user", "alpha hash gamma beta join delta", None, "2024-01-01 00:00:05"),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, positions=True, cache=False)

    expect = {
        '"hash join"': {0, 4},
        '"hash join"~1': {0, 1, 4},
        '"hash join"~2': {0, 1, 4, 5},
        '"hash join"~3': {0, 1, 2, 4, 5},
        '"hash beta join"~1': {5},  # 3-term greedy chain
    }
    for q, want in expect.items():
        got = {r["turn_idx"] for r in search(idx, q, k=10).collect()}
        assert got == want, q
        rp = {
            r["turn_idx"]
            for r in turns.where(
                row_predicate(parse_query(q), tokens_col("text"))
            ).collect()
        }
        assert rp == want, f"row predicate {q}"
    # slop parses; slop=0 suffix == bare phrase
    n = parse_query('"hash join"~2')
    assert n.slop == 2 and n.values == ("hash", "join")


def test_nonlatin_phrase_through_analyzer(spark):
    """A phrase on a ru-analyzed index must match through the analyzed
    stems: Phrase values arrive pre-analyzed from parse_query and must
    NOT be re-tokenized with the latin-only LogMill regex (which
    silently dropped every non-latin term)."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search
    from miru_spark.query.phrase import phrase_match_docs

    rows = [
        ("c1", 0, "user", "Быстрые лисы используют spark запросы", None, 1),
        # both stems present but in reverse order — exact and ordered
        # proximity must both reject
        ("c1", 1, "user", "лисы медленно но быстрые собаки", None, 2),
        ("c2", 0, "user", "вчера быстрые лисы прыгали", None, 3),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts long",
    )
    idx = InvertedIndex.build(df, positions=True, analyzer="ru")
    hits = search(idx, '"быстрые лисы"', k=5)
    assert {(r.conv_id, r.turn_idx) for r in hits.collect()} == {
        ("c1", 0),
        ("c2", 0),
    }
    # raw-string entry point analyzes with the index's analyzer too
    assert phrase_match_docs(idx, "быстрые лисы").count() == 2
