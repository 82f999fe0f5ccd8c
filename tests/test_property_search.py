"""Property-based search parity: hypothesis-generated boolean queries
must rank identically between the Spark engine and the pure-pandas
oracle over a fixed deterministic corpus.

The e2e suite pins a hand-picked reference query set; this file walks
the query-language lattice instead — random AND/OR/AND NOT trees over
in-vocabulary terms, out-of-vocabulary terms, prefixes, and metadata
fields — so grammar corners nobody thought to pin (pure-NOT seeds,
OOV-only conjunctions, prefix/exact overlap) still get rank-checked.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from miru_spark.index import InvertedIndex
from miru_spark.oracle import PandasIndex
from miru_spark.query.bm25 import search

# in-vocabulary words for the seed-42 synthetic corpus, one OOV word,
# a prefix that overlaps the exact terms, and metadata leaves
ATOMS = [
    "w00001",
    "w00002",
    "w00007",
    "w00042",
    "zzzunseen",
    "w0000*",
    "role:assistant",
    "tool:bash",
    # full query-language lattice: boosts, wildcard/fuzzy/regexp
    # (multi-term rewrites), phrases (positional), slop phrases,
    # typed metadata ranges — each independently reimplemented in
    # miru_spark/oracle.py
    "w00007^2",
    "w?0002",
    "w00042~1",
    "/w0000[17]/",
    '"w00001 w00002"',
    '"w00002 w00007"~3',
    "turn_idx:[1 TO 8]",
]

atom = st.sampled_from(ATOMS)
expr = st.recursive(
    atom,
    lambda child: st.builds(
        lambda a, op, b: f"({a} {op} {b})",
        child,
        st.sampled_from(["AND", "OR", "AND NOT"]),
        child,
    ),
    max_leaves=4,
)


@pytest.fixture(scope="module")
def built(tiny_turns, tiny_pdf):
    idx = InvertedIndex.build(tiny_turns)
    oracle = PandasIndex(tiny_pdf)
    yield idx, oracle
    idx.unpersist()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=expr)
def test_random_query_rank_parity(built, q):
    idx, oracle = built
    got = search(idx, q, k=10).toPandas()
    exp = oracle.search(q, k=10)
    assert len(got) == len(exp), f"{q}: {len(got)} != {len(exp)}"
    for i, (g, e) in enumerate(
        zip(got.to_dict("records"), exp.to_dict("records"))
    ):
        assert g["docint"] == e["docint"], f"{q} rank {i}"
        assert abs(g["score"] - e["score"]) < 1e-6, f"{q} rank {i} score"


# every atom standalone plus cross-feature combinations hypothesis may
# not sample — deterministic, so each language feature gets at least
# one rank-parity check per run
PINNED = ATOMS + [
    '"w00001 w00002" OR w00007^3',
    '(w00042~1 AND turn_idx:[0 TO 6]) OR /w0000[17]/',
    'w?0002 AND NOT "w00002 w00007"~3',
    "role:assistant AND w00007^2 AND NOT w00001",
    'turn_idx:{1 TO 8] AND w0000*',
    # peeled-metadata fused plans (bm25._peel_meta_conjuncts): positive
    # and negated doc-meta conjuncts ride the single postings scan as a
    # doc-mask semi-join
    "w0000* AND role:assistant AND NOT tool:bash",
    "tool:bash AND w00042~1 AND turn_idx:[0 TO 9]",
    "w00001 AND NOT role:user AND NOT w00002",
]


@pytest.mark.parametrize("q", PINNED)
def test_pinned_query_rank_parity(built, q):
    idx, oracle = built
    got = search(idx, q, k=10).toPandas()
    exp = oracle.search(q, k=10)
    assert len(got) == len(exp), f"{q}: {len(got)} != {len(exp)}"
    for i, (g, e) in enumerate(
        zip(got.to_dict("records"), exp.to_dict("records"))
    ):
        assert g["docint"] == e["docint"], f"{q} rank {i}"
        assert abs(g["score"] - e["score"]) < 1e-6, f"{q} rank {i} score"
