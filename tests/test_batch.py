"""Batch serving must be result-identical to per-query search."""

import time

import numpy as np
import pytest

from miru_spark.index import InvertedIndex
from miru_spark.query.batch import search_batch
from miru_spark.query.bm25 import search

QUERIES = [
    ("q1", "w00001 AND w00004", 10),
    ("q2", "w00003 OR w09999", 10),
    ("q3", "w0001*", 5),
    ("q4", "w00002 w00005 w00010", 10),
    ("q5", "w00001 AND NOT w00002", 7),  # AND-with-NOT: fuses (weightless neg rows)
    ("q5b", "(w00004 AND w00005) AND NOT (w00006 OR w00007)", 7),
    ("q5c", "w00001 AND NOT role:assistant", 7),  # non-text NOT → fallback
    ("q6", "w00000", 3),
    ("q7", "w0000?", 5),  # wildcard: multiterm-rewritten, fuses
    ("q8", "w00001~1", 5),  # fuzzy: multiterm-rewritten, fuses
    ("q9", "w00001^2 OR w00003", 5),  # '^B' boost fuses too
    ("q10", "w00001^2.5 AND w00004", 5),
    ("q11", "w00001^3 OR w0000*", 5),  # boosted leaf overlapping a prefix
    ("p1", '"w00000 w00001"', 10),  # exact phrase: shared positional scan
    ("p2", '"w00001 w00000"', 10),  # order matters
    ("p3", '"w00000 w00000"', 5),  # repeated member term scores once
    ("p4", '"w00002 w00003"^2', 5),  # phrase boost
    ("p5", 'role:user AND "w00000 w00001"', 5),  # masked phrase: shared mask scan
    ("p5b", 'tool:bash AND NOT role:user AND "w00001 w00000"', 5),
    ("p6", '"w00000 w00001"~2', 5),  # ordered proximity: batches (r5)
    ("p7", '"w00001 w00004"~3', 5),  # proximity, distinct terms
    ("p8", 'role:user AND "w00000 w00001"~2', 5),  # masked proximity
    ("m1", "w00001 OR role:assistant", 10),  # OR-over-metadata (r5)
    ("m2", "role:user OR tool:bash", 5),  # pure-metadata OR (0.0 scores)
    ("m3", "w00003 OR w00007 OR role:assistant", 10),
]


@pytest.fixture(scope="module")
def built(small_turns):
    idx = InvertedIndex.build(small_turns)
    idx.postings = idx.postings.cache()
    idx.postings.count()
    yield idx
    idx.unpersist()


def test_batch_matches_individual(built):
    batch = search_batch(built, QUERIES).toPandas()
    for qid, qs, k in QUERIES:
        got = batch[batch["query_id"] == qid].sort_values("rank")
        exp = search(built, qs, k=k).toPandas()
        assert list(got["docint"]) == list(exp["docint"]), qid
        assert np.allclose(got["score"], exp["score"], atol=1e-9), qid
        assert list(got["rank"]) == list(range(1, len(exp) + 1)), qid


def test_batch_amortizes(built):
    """One batch job should beat N sequential jobs (sanity, generous)."""
    fused = [q for q in QUERIES if "NOT" not in q[1]]
    t0 = time.time()
    search_batch(built, fused).collect()
    batch_sec = time.time() - t0
    t0 = time.time()
    for _, qs, k in fused:
        search(built, qs, k=k).collect()
    seq_sec = time.time() - t0
    assert batch_sec < seq_sec * 1.5  # generous: sandbox noise


def test_overlapping_leaves_score_once(built):
    """A term matched by several leaves of one query (exact 'w00001' AND
    an overlapping prefix 'w0000*') must contribute once — batch results
    stay identical to the fused single-query path."""
    overlap = [
        ("o1", "w00001 OR w0000*", 10),
        ("o2", "w00001 AND w0000*", 10),
    ]
    batch = search_batch(built, overlap).toPandas()
    for qid, qs, k in overlap:
        got = batch[batch["query_id"] == qid].sort_values("rank")
        exp = search(built, qs, k=k).toPandas()
        assert list(got["docint"]) == list(exp["docint"]), qid
        assert np.allclose(got["score"], exp["score"], atol=1e-9), qid


# ---------------------------------------------------------------------------
# property: ANY random mix of query shapes stays result-identical to the
# per-query engine — fused shapes share the scan, everything else
# (phrases, metadata conjuncts) exercises the fallback path
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BATCH_ATOMS = [
    "w00001",
    "w00002 AND w00007",
    "w00003 OR w09999",
    "w0001*",
    "w00001 AND NOT w00002",
    "w0000?",
    "w00042~1",
    "w00007^2 OR w00003",
    "role:assistant AND w00007",
    "w00001 AND NOT role:user",
    '"w00001 w00002"',
    "turn_idx:[1 TO 8] AND w0000*",
]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from(BATCH_ATOMS), min_size=1, max_size=5, unique=True),
    st.integers(3, 10),
)
def test_batch_parity_random(built, qset, k):
    queries = [(f"q{i}", qs, k) for i, qs in enumerate(qset)]
    batch = search_batch(built, queries).toPandas()
    for qid, qs, kk in queries:
        got = batch[batch["query_id"] == qid].sort_values("rank")
        exp = search(built, qs, k=kk).toPandas()
        assert list(got["docint"]) == list(exp["docint"]), (qid, qs)
        assert np.allclose(got["score"], exp["score"], atol=1e-9), (qid, qs)


def test_batch_dismax_and_msm_variants(built):
    """Per-query opts route dismax / minimum_should_match through the
    SAME shared scan, result-identical to their single-query engines;
    plain queries in the same batch are untouched."""
    from miru_spark.query.bm25 import search_dismax, search_min_should_match

    queries = [
        ("d1", "w00001 OR w00003 OR w00007", 10, {"tie": 0.0}),
        ("d2", "w00001 OR w00003", 10, {"tie": 0.3}),
        ("d3", "w00002", 10, {"tie": 0.5}),  # single clause
        # metadata conjunct peels onto the shared docs mask
        ("d4", "(w00001 OR w00003) AND role:user", 10, {"tie": 0.25}),
        ("m1", "w00001 w00003 w00007", 10, {"min_should_match": 2}),
        ("m2", "w00001 OR w00003 OR w00005 OR w00007", 8,
         {"min_should_match": 3}),
        # multiterm rewrite: the wildcard group is ONE clause
        ("m3", "w00001 w0000*", 10, {"min_should_match": 2}),
        ("p1", "w00001 AND w00004", 10),  # plain rides along
    ]
    batch = search_batch(built, queries).toPandas()
    for item in queries:
        qid, qs, k = item[0], item[1], item[2]
        opts = item[3] if len(item) > 3 else {}
        if opts.get("tie") is not None:
            exp = search_dismax(built, qs, tie_breaker=opts["tie"], k=k)
        elif opts.get("min_should_match") is not None:
            exp = search_min_should_match(
                built, qs, m=opts["min_should_match"], k=k
            )
        else:
            exp = search(built, qs, k=k)
        exp = exp.toPandas()
        got = batch[batch["query_id"] == qid].sort_values("rank")
        assert list(got["docint"]) == list(exp["docint"]), (qid, qs)
        assert np.allclose(got["score"], exp["score"], atol=1e-9), (qid, qs)


def test_batch_dismax_rejects_and(built):
    with pytest.raises(ValueError, match="dismax"):
        search_batch(
            built, [("bad", "w00001 AND w00004", 5, {"tie": 0.1})]
        ).collect()
