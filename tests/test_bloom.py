"""Per-doc bloom prefilter (BloomIndex semantics): no false negatives,
selective prefiltering, exact verified output."""

import pytest

from miru_spark.index import InvertedIndex
from miru_spark.operators.bloom import (
    contains_all,
    doc_term_blooms,
    might_contain,
)


@pytest.fixture(scope="module")
def idx(small_turns):
    idx = InvertedIndex.build(small_turns)
    idx.postings = idx.postings.cache()
    idx.postings.count()
    yield idx
    idx.unpersist()


def _exact_contains(idx, terms):
    from pyspark.sql import functions as F

    return {
        r["docint"]
        for r in idx.postings.where(F.col("term").isin(terms))
        .groupBy("docint")
        .agg(F.count_distinct("term").alias("n"))
        .where(F.col("n") == len(terms))
        .collect()
    }


def test_no_false_negatives_and_selective(idx):
    blooms = doc_term_blooms(idx.postings).cache()
    n_docs = blooms.count()
    exact = _exact_contains(idx, ["w00050", "w00123"])
    cand = {
        r["docint"]
        for r in blooms.where(
            might_contain("bloom", "w00050") & might_contain("bloom", "w00123")
        ).collect()
    }
    assert exact <= cand  # bloom never loses a true match
    assert len(cand) < n_docs  # and actually prunes
    blooms.unpersist()


def test_contains_all_is_exact(idx):
    for terms in [["w00050", "w00123"], ["w00000"], ["w00001", "w00002", "w00003"]]:
        got = {r["docint"] for r in contains_all(idx, terms).collect()}
        assert got == _exact_contains(idx, terms), terms
