"""Exact-substring span dedup (operators/dedup.py) and facet counts
(query/facets.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from miru_spark.operators.dedup import duplicate_spans, strip_duplicate_spans
from miru_spark.tokenize import tokenize_py

K = 5


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (0, "a b c d e x"),  # first corpus occurrence of "a b c d e"
        (1, "q a b c d e"),  # dup at pos 1 -> strips to "q"
        (2, "a b c d e"),  # fully covered -> strips to ""
        (3, "p q r s"),  # shorter than k -> untouched
        (4, "m n o p q r s t"),  # unique spans -> untouched
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_counts(span_docs):
    got = {
        r["gram"]: (r["n_occ"], r["n_docs"])
        for r in duplicate_spans(span_docs, k=K).collect()
    }
    assert got == {"a b c d e": (3, 3)}


def test_strip_duplicate_spans_tiny(span_docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in strip_duplicate_spans(span_docs, k=K).collect()
    }
    assert got[0] == (6, 0, "a b c d e x")  # keeper occurrence survives
    assert got[1] == (6, 5, "q")
    assert got[2] == (5, 5, "")
    assert got[3] == (4, 0, "p q r s")
    assert got[4] == (8, 0, "m n o p q r s t")


def test_strip_is_idempotent_on_clean_output(span_docs):
    """Stripping the stripped corpus removes nothing further — each
    duplicated span kept exactly one occurrence."""
    first = strip_duplicate_spans(span_docs, k=K).select(
        "doc_id", pd_col := "clean_text"
    )
    again = strip_duplicate_spans(first, k=K, text_col=pd_col)
    assert again.agg({"n_removed": "sum"}).collect()[0][0] == 0


def test_strip_duplicate_spans_overlap(spark):
    """Overlapping duplicated spans union their covered positions."""
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),  # spans "a b c d e"(0), "b c d e f"(1)
            (1, "z a b c d e f"),  # both spans duplicated, offset by 1
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in strip_duplicate_spans(docs, k=K).collect()
    }
    assert got[0] == (0, "a b c d e f")
    assert got[1] == (6, "z")  # positions 1..6 covered by the union


def test_facet_counts_vs_pandas(tiny_turns, tiny_pdf):
    from miru_spark.index import InvertedIndex
    from miru_spark.query.facets import facet_counts

    idx = InvertedIndex.build(tiny_turns)
    got = {
        (r["facet"], r["value"]): r["n"]
        for r in facet_counts(idx, "w00001", ("role", "tool"), top_n=100).collect()
    }
    pdf: pd.DataFrame = tiny_pdf
    matched = pdf[pdf["text"].map(lambda t: "w00001" in tokenize_py(t))]
    assert len(matched) > 0
    expect: dict[tuple[str, str | None], int] = {}
    for col in ("role", "tool"):
        for val, n in matched[col].value_counts(dropna=False).items():
            key = (col, None if pd.isna(val) else val)
            expect[key] = int(n)
    assert got == expect
    idx.unpersist()


def test_significant_terms_vs_pandas(tiny_turns, tiny_pdf):
    from collections import Counter

    from miru_spark.index import InvertedIndex
    from miru_spark.query.facets import significant_terms

    idx = InvertedIndex.build(tiny_turns)
    got = [
        (r["term"], r["fg"], r["df"], r["score"])
        for r in significant_terms(idx, "w00002", top_n=10, min_fg=2).collect()
    ]

    toks = tiny_pdf["text"].map(lambda t: set(tokenize_py(t)))
    df_counts = Counter(t for s in toks for t in s)
    n_docs = len(tiny_pdf)
    matched = toks[toks.map(lambda s: "w00002" in s)]
    fgt = len(matched)
    fg_counts = Counter(t for s in matched for t in s)
    scored = []
    for t, fg in fg_counts.items():
        if fg < 2:
            continue
        fg_pct = fg / fgt
        bg_pct = df_counts[t] / n_docs
        scored.append((t, fg, df_counts[t], (fg_pct - bg_pct) * (fg_pct / bg_pct)))
    scored.sort(key=lambda x: (-x[3], x[0]))
    expect = scored[:10]
    assert [g[:3] for g in got] == [e[:3] for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[3] - e[3]) < 1e-9
    # the query term itself is maximally significant (fg == answer size)
    assert got[0][0] == "w00002"
    idx.unpersist()
