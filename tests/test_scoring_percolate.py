"""Recency decay, LM-Dirichlet ranking, and percolation vs pandas twins."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from miru_spark.oracle import PandasIndex
from miru_spark.tokenize import tokenize_py

REF_TS = "2024-02-01 00:00:00"
HALF_LIFE = 604_800.0
MU = 2000.0


@pytest.fixture(scope="module")
def built(small_turns, small_pdf):
    from miru_spark.index import InvertedIndex

    idx = InvertedIndex.build(small_turns)
    oracle = PandasIndex(small_pdf)
    yield idx, oracle
    idx.unpersist()


def test_recency_rank_identical(built, small_pdf):
    import pandas as pd

    from miru_spark.query.scoring import search_recency

    idx, oracle = built
    got = search_recency(
        idx, "w00001 OR w00040", ref_ts=REF_TS, half_life_s=HALF_LIFE, k=15
    ).collect()

    base = oracle.search("w00001 OR w00040", k=10**9)
    ts_by_doc = dict(zip(oracle.docs["docint"], oracle.docs["ts"]))
    ref = pd.Timestamp(REF_TS)
    rows = []
    for r in base.itertuples():
        age = max((ref - ts_by_doc[r.docint]).total_seconds(), 0.0)
        rows.append((r.docint, r.score * 0.5 ** (age / HALF_LIFE)))
    rows.sort(key=lambda x: (-x[1], -x[0]))
    expect = rows[:15]

    assert [r["docint"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r["score"] - s) < 1e-6


def test_recency_never_boosts_future_docs(built, small_pdf):
    """A mid-stream ref_ts: docs newer than ref decay to EXACTLY 1.0
    (clamped age), never a >1 boost — ES decay-function semantics."""
    import pandas as pd

    from miru_spark.query.bm25 import search
    from miru_spark.query.scoring import search_recency

    idx, _ = built
    mid = "2024-01-01 02:00:00"  # fixture ts span is 2024-01-01 00:00..05:33
    base = {
        r["docint"]: r["score"]
        for r in search(idx, "w00001 OR w00040", k=10**6).collect()
    }
    got = search_recency(
        idx, "w00001 OR w00040", ref_ts=mid, half_life_s=HALF_LIFE, k=10**6
    ).collect()
    ts_by_doc = {
        r["docint"]: pd.Timestamp(r["ts"])
        for r in idx.docs.select("docint", "ts").collect()
    }
    saw_future = False
    for r in got:
        assert r["score"] <= base[r["docint"]] + 1e-9  # never boosted
        if ts_by_doc[r["docint"]] > pd.Timestamp(mid):
            saw_future = True
            assert abs(r["score"] - base[r["docint"]]) < 1e-9  # factor == 1
    assert saw_future  # the mid-stream ref actually exercises the clamp


def test_lm_dirichlet_rank_identical(built):
    from miru_spark.query.scoring import search_lm_dirichlet

    idx, oracle = built
    got = search_lm_dirichlet(idx, "w00001 OR w00040", mu=MU, k=15).collect()

    total = sum(sum(p.values()) for p in oracle.post.values())
    dl = dict(zip(oracle.docs["docint"], oracle.docs["doclen"]))
    scores: dict[int, float] = {}
    for t in ["w00001", "w00040"]:
        cf = sum(oracle.post.get(t, {}).values())
        for d, tf in oracle.post.get(t, {}).items():
            scores[d] = scores.get(d, 0.0) + (
                math.log(1 + tf * total / (MU * cf))
                + math.log(MU / (MU + dl[d]))
            )
    expect = sorted(scores.items(), key=lambda x: (-x[1], -x[0]))[:15]

    assert [r["docint"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r["score"] - s) < 1e-6


def test_percolate_vs_pandas(built, small_pdf):
    from miru_spark.query.percolate import percolate

    idx, oracle = built
    stored = [
        ("q_a", ["w00001", "w00002"]),
        ("q_b", ["w00040"]),
        ("q_dup_terms", ["w00003", "w00003", "w00010"]),
    ]
    got = {
        (r["qid"], r["docint"])
        for r in percolate(idx, stored).collect()
    }

    expect = set()
    toks = dict(
        zip(oracle.docs["docint"], oracle.docs["tokens"].map(set))
    )
    for qid, terms in stored:
        need = set(terms)
        for d, tset in toks.items():
            if need <= tset:
                expect.add((qid, d))
    assert got == expect
    assert any(q == "q_a" for q, _ in expect)  # non-vacuous
    assert any(q == "q_dup_terms" for q, _ in expect)
