"""End-to-end rank-identical check: Spark engine vs pure-pandas oracle
on a fixed reference query set (the upgraded RecoCorrectnessTest
pattern, SURVEY.md §5)."""

from __future__ import annotations

import pytest

from miru_spark.index import InvertedIndex
from miru_spark.oracle import PandasIndex
from miru_spark.query.bm25 import search

# FIXTURES.md §2 — the reference query set shape: default-AND of
# dictionary terms (MiruFullTextNGTest.java:215-224) + parser surface
# (term, prefix*, AND/OR/NOT, field:term).
QUERIES = [
    ("w00000", 10),
    ("w00001 AND w00004", 10),
    ("w00002 w00005 w00010", 10),
    ("w00003 OR w09999", 10),
    ("w00001 AND NOT w00002", 10),
    ("w0001*", 10),
    ("role:assistant AND w00007", 10),
    ("tool:bash AND w00001", 10),
    ("(w00004 OR w00005) AND NOT w00006", 10),
    ("w00020 OR (w00030 AND w00040)", 25),
    ("NOT w00000", 10),
    ("w00000 AND w00001 AND w00002 AND w00003", 100),
]


@pytest.fixture(scope="module")
def built(small_turns, small_pdf):
    idx = InvertedIndex.build(small_turns)
    oracle = PandasIndex(small_pdf)
    yield idx, oracle
    idx.unpersist()


def _assert_rank_identical(got, exp, qid=""):
    assert len(got) == len(exp), f"{qid}: row count {len(got)} != {len(exp)}"
    for i, (g, e) in enumerate(
        zip(got.to_dict("records"), exp.to_dict("records"))
    ):
        assert g["docint"] == e["docint"], (
            f"{qid} rank {i}: doc {g['docint']} != {e['docint']} "
            f"(scores {g['score']:.6f} vs {e['score']:.6f})"
        )
        assert g["conv_id"] == e["conv_id"] and g["turn_idx"] == e["turn_idx"]
        assert abs(g["score"] - e["score"]) < 1e-6, f"{qid} rank {i} score"


@pytest.mark.parametrize("query,k", QUERIES, ids=[q for q, _ in QUERIES])
def test_bm25_rank_identical(built, query, k):
    idx, oracle = built
    got = search(idx, query, k=k).toPandas()
    exp = oracle.search(query, k=k)
    _assert_rank_identical(got, exp, query)
    if "NOT" not in query and "role:" not in query and "tool:" not in query:
        assert len(got) > 0, f"{query}: expected matches in Zipf corpus"


@pytest.mark.parametrize("query", ["w00000", "w00001 AND w00002"])
def test_time_strategy(built, query):
    idx, oracle = built
    got = search(idx, query, k=10, strategy="time").toPandas()
    exp = oracle.search(query, k=10, strategy="time")
    assert list(got["docint"]) == list(exp["docint"])
    assert (got["score"] == 0.0).all()  # TIME strategy scores are zero
    # newest-first: docint strictly decreasing (FullText.collectTime)
    assert list(got["docint"]) == sorted(got["docint"], reverse=True)


def test_time_range_mask(built, small_pdf):
    idx, oracle = built
    ts = sorted(small_pdf["ts"])
    lo, hi = ts[len(ts) // 4], ts[3 * len(ts) // 4]
    got = search(idx, "w00000", k=20, ts_lo=lo, ts_hi=hi).toPandas()
    exp = oracle.search("w00000", k=20, ts_lo=lo, ts_hi=hi)
    _assert_rank_identical(got, exp, "time-range")


def test_unique_token_exact_match(built, small_pdf):
    """uniq tokens occur exactly once — exact-match invariant."""
    idx, oracle = built
    row = small_pdf[small_pdf["text"].str.contains("uniq0 ", regex=False) | small_pdf["text"].str.endswith("uniq0")]
    got = search(idx, "uniq0", k=5).toPandas()
    exp = oracle.search("uniq0", k=5)
    _assert_rank_identical(got, exp, "uniq0")
    assert len(got) == len(row) == 1


def test_shuffle_partition_invariance(spark, small_turns, small_pdf):
    """Rank-identical at a different shuffle-partition setting
    (FIXTURES.md §5: determinism across parallelism)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        idx = InvertedIndex.build(small_turns, cache=False)
        got = search(idx, "w00001 AND w00004", k=10).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    exp = PandasIndex(small_pdf).search("w00001 AND w00004", k=10)
    _assert_rank_identical(got, exp, "shuffle-invariance")


def test_paging_resumable_topk(built):
    """Keyset paging (search(after=..., exclude=...)): three pages of k
    concatenate to exactly the single-shot top-3k, disjoint and in the
    same (score desc, docint desc) order — the reference's lowestScore
    carry-over floor (FullText.java:134,203) as resumable top-k."""
    idx, _ = built
    k = 7
    single = search(idx, "w00003 OR w09999", k=3 * k).toPandas()
    pages, seen, floor = [], [], None
    for _ in range(3):
        page = search(
            idx, "w00003 OR w09999", k=k, after=floor, exclude=list(seen)
        ).toPandas()
        if page.empty:
            break
        pages.append(page)
        seen.extend(page["docint"].tolist())
        floor = float(page["score"].iloc[-1])
    import pandas as pd

    got = pd.concat(pages, ignore_index=True)
    assert len(set(seen)) == len(seen), "pages overlap"
    assert got["docint"].tolist() == single["docint"].tolist()[: len(got)]
    assert (got["score"].values - single["score"].values[: len(got)] == 0).all()


def test_paging_time_strategy(built):
    idx, _ = built
    single = search(idx, "w00000", k=20, strategy="time").toPandas()
    p1 = search(idx, "w00000", k=10, strategy="time").toPandas()
    p2 = search(
        idx, "w00000", k=10, strategy="time", exclude=p1["docint"].tolist()
    ).toPandas()
    assert p1["docint"].tolist() + p2["docint"].tolist() == single["docint"].tolist()


def test_explain_scores_decomposition(built):
    """explain_scores rows reproduce the top-k exactly and each hit's
    per-term contributions sum to its score; non-fusable queries refuse."""
    import pytest as _pytest

    from miru_spark.query.explain import explain_scores

    idx, _ = built
    q = "w00001 OR w00002"
    hits = search(idx, q, k=5).toPandas()
    ex = explain_scores(idx, q, k=5).toPandas()
    assert set(ex["docint"]) == set(hits["docint"])
    sums = ex.groupby("docint")["contrib"].sum()
    for _, h in hits.iterrows():
        assert abs(sums[h["docint"]] - h["score"]) < 1e-9
    # factor sanity: contrib recomputes from the row's own (tf, idf, doclen)
    row = ex.iloc[0]
    recomputed = (
        row["idf"] * row["tf"] * 2.2
        / (row["tf"] + 1.2 * (0.25 + 0.75 * row["doclen"] / idx.avg_doclen))
    )
    assert abs(recomputed - row["contrib"]) < 1e-9
    with _pytest.raises(ValueError):
        explain_scores(idx, "NOT w00001", k=5)


def test_min_should_match_bounds(built, small_pdf):
    """m=1 equals plain OR; m=n equals AND; m between prunes to docs
    with >= m distinct query terms, all matched terms scoring."""
    from miru_spark.query.bm25 import search_min_should_match

    idx, oracle = built
    q = "w00001 OR w00002 OR w00003"
    or_hits = search(idx, q, k=10).toPandas()
    m1 = search_min_should_match(idx, q, m=1, k=10).toPandas()
    assert list(m1["docint"]) == list(or_hits["docint"])
    and_hits = search(idx, "w00001 AND w00002 AND w00003", k=10).toPandas()
    m3 = search_min_should_match(idx, q, m=3, k=10).toPandas()
    assert list(m3["docint"]) == list(and_hits["docint"])
    # m=2: every hit has >= 2 of the three terms (checked in the corpus)
    m2 = search_min_should_match(idx, q, m=2, k=10).toPandas()
    terms = {"w00001", "w00002", "w00003"}
    by_doc = small_pdf.set_index(["conv_id", "turn_idx"])["text"]
    from miru_spark.tokenize import tokenize_py

    for _, h in m2.iterrows():
        toks = set(tokenize_py(by_doc.loc[(h["conv_id"], h["turn_idx"])]))
        assert len(toks & terms) >= 2


def test_min_should_match_counts_clauses_not_terms(built, small_pdf):
    """A grouped clause (synonym / multi-term-rewrite shape) counts ONCE
    toward m, exactly like a Lucene SHOULD clause — matching several of
    its member terms must not inflate the clause count."""
    from miru_spark.query.bm25 import search_min_should_match
    from miru_spark.tokenize import tokenize_py

    idx, _ = built
    # 2 clauses: [w00001], [w00002 OR w00003]. m=2 requires w00001 AND
    # (w00002 OR w00003) — a doc with only w00002+w00003 has 1 clause.
    q = "w00001 OR (w00002 OR w00003)"
    m2 = search_min_should_match(idx, q, m=2, k=25).toPandas()
    by_doc = small_pdf.set_index(["conv_id", "turn_idx"])["text"]
    assert len(m2) > 0
    for _, h in m2.iterrows():
        toks = set(tokenize_py(by_doc.loc[(h["conv_id"], h["turn_idx"])]))
        assert "w00001" in toks and ({"w00002", "w00003"} & toks), (
            h["conv_id"], h["turn_idx"])
    # equivalently: identical doc set to the explicit boolean form
    explicit = search(idx, "w00001 AND (w00002 OR w00003)", k=25).toPandas()
    assert sorted(m2["docint"]) == sorted(explicit["docint"])


def test_dismax_bounds(built):
    """tie_breaker=1 equals the plain OR sum; tie_breaker=0 is pure max
    (never exceeds the sum, equals it for single-term hits)."""
    from miru_spark.query.bm25 import search_dismax

    idx, _ = built
    q = "w00001 OR w00002 OR w00003"
    or_hits = search(idx, q, k=10).toPandas()
    d1 = search_dismax(idx, q, tie_breaker=1.0, k=10).toPandas()
    assert list(d1["docint"]) == list(or_hits["docint"])
    assert max(abs(d1["score"] - or_hits["score"])) < 1e-9
    d0 = search_dismax(idx, q, tie_breaker=0.0, k=10).toPandas()
    sums = or_hits.set_index("docint")["score"]
    for _, h in d0.iterrows():
        if h["docint"] in sums.index:
            assert h["score"] <= sums[h["docint"]] + 1e-9


def test_fused_not_path_parity(built, monkeypatch):
    """AND-with-NOT queries take the fused single-scan plan (negated
    terms widen the scan predicate, score weight stays positive-only)
    and return exactly what the general tree plan returns."""
    import miru_spark.query.bm25 as bm25
    from miru_spark.query.parser import parse_query

    idx, _ = built
    fused_qs = [
        "w00003 AND NOT w00007",
        "w00001 AND w00002 AND NOT w00005",
        "w0000* AND NOT w00004",
        "w00002 AND NOT (w00003 OR w00009)",
        "w00001 AND NOT w0001*",
        "(w00004 AND w00005) AND NOT (w00006 OR w00007)",  # nested AND flattens
    ]
    for q in fused_qs:
        node = parse_query(q, idx.analyzer)
        assert bm25._fusable(node) is None
        assert bm25._fusable_not(node) is not None, q
        new = search(idx, q, k=15).toPandas()
        with monkeypatch.context() as m:
            m.setattr(bm25, "_fusable_not", lambda n: None)
            old = search(idx, q, k=15).toPandas()
        assert list(new["docint"]) == list(old["docint"]), q
        assert max(abs(new["score"] - old["score"]), default=0.0) < 1e-9, q
    # shapes that must NOT fuse: pure NOT (no seed), non-text negation,
    # NOT of a conjunction
    for q in ["NOT w00000", "w00001 AND NOT role:assistant"]:
        node = parse_query(q, idx.analyzer)
        assert bm25._fusable_not(node) is None, q


def test_min_should_match_implicit_and(built, small_pdf):
    """An implicit-AND query string ('w00001 w00002 w00003' under the
    default-AND parser) is accepted: calling min_should_match declares
    the clauses SHOULD, so results equal the explicit-OR spelling."""
    from miru_spark.query.bm25 import search_min_should_match

    idx, _ = built
    for m in (1, 2, 3):
        got = search_min_should_match(
            idx, "w00001 w00002 w00003", m=m, k=10
        ).toPandas()
        exp = search_min_should_match(
            idx, "w00001 OR w00002 OR w00003", m=m, k=10
        ).toPandas()
        assert list(got["docint"]) == list(exp["docint"]), m
        assert list(got["score"]) == list(exp["score"]), m


def test_dismax_metadata_conjunct_peels(built, small_pdf):
    """'(a OR b) AND role:x' runs dismax over the text subtree with the
    metadata conjunct as a doc mask: results equal the unmasked dismax
    restricted to role-matching docs; a true AND of text leaves still
    raises."""
    import pytest as _pytest

    from miru_spark.query.bm25 import search_dismax

    idx, _ = built
    q = "(w00001 OR w00002) AND role:assistant"
    got = search_dismax(idx, q, tie_breaker=0.3, k=50).toPandas()
    unmasked = search_dismax(
        idx, "w00001 OR w00002", tie_breaker=0.3, k=1000
    ).toPandas()
    roles = small_pdf.set_index(["conv_id", "turn_idx"])["role"]
    exp = unmasked[
        [
            roles.loc[(r["conv_id"], r["turn_idx"])] == "assistant"
            for _, r in unmasked.iterrows()
        ]
    ].head(50)
    assert list(got["docint"]) == list(exp["docint"])
    assert list(got["score"]) == list(exp["score"])
    with _pytest.raises(ValueError):
        search_dismax(idx, "w00001 AND w00002", k=5)
