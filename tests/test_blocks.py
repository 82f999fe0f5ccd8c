"""Block segments: codec-level round-trip through Spark and
rank-identical equivalence of the block-max paths vs the flat engine."""

from __future__ import annotations

import numpy as np
import pytest

from miru_spark.index import InvertedIndex
from miru_spark.indexing.codec import varint_decode
from miru_spark.oracle import PandasIndex
from miru_spark.query.blockmax import search_blocks_and, search_blocks_or
from miru_spark.query.bm25 import search


@pytest.fixture(scope="module")
def bidx(spark, small_turns, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("segments"))
    idx = InvertedIndex.build_persisted(
        small_turns, path, positions=False, blocks=True
    )
    yield idx


def test_blocks_roundtrip_vs_flat(spark, bidx):
    """Decoding every block must reproduce the flat postings exactly."""
    flat = {
        (r["term"], r["docint"]): (r["tf"], r["doclen"])
        for r in bidx.postings.collect()
    }
    n = 0
    for row in bidx.blocks.collect():
        gaps = varint_decode(row["docs_bin"])
        docs = np.cumsum(gaps, dtype=np.uint64).astype(np.int64)
        tfs = varint_decode(row["tfs_bin"])
        dls = varint_decode(row["dls_bin"])
        assert row["first_doc"] == docs[0] and row["last_doc"] == docs[-1]
        assert row["n_docs"] == len(docs)
        assert int(tfs.max()) == row["max_tf"]
        for d, tf, dl in zip(docs, tfs, dls):
            assert (d >> 13) == row["block_id"]
            assert flat[(row["term"], d)] == (int(tf), int(dl))
            n += 1
    assert n == len(flat)


@pytest.mark.parametrize(
    "terms", [["w00001", "w00004"], ["w00000"], ["w00002", "w00005", "w00010"]]
)
def test_block_and_matches_flat(bidx, terms, small_pdf):
    got = search_blocks_and(bidx, terms, k=10).toPandas()
    exp = search(bidx, " AND ".join(terms), k=10).toPandas()
    assert list(got["docint"]) == list(exp["docint"])
    assert np.allclose(got["score"], exp["score"], atol=1e-9)
    oracle = PandasIndex(small_pdf).search(" AND ".join(terms), k=10)
    assert list(got["docint"]) == list(oracle["docint"])


@pytest.mark.parametrize(
    "terms", [["w00003", "w09999"], ["w00001", "w00002", "w00007"], ["w00000"]]
)
def test_block_or_matches_flat(bidx, terms):
    got = search_blocks_or(bidx, terms, k=10, probe_blocks=4).toPandas()
    exp = search(bidx, " OR ".join(terms), k=10).toPandas()
    assert list(got["docint"]) == list(exp["docint"])
    assert np.allclose(got["score"], exp["score"], atol=1e-9)


def test_block_or_pruning_exact_with_tiny_probe(bidx):
    """Even a 1-block probe (worst floor) must stay exact."""
    got = search_blocks_or(bidx, ["w00000", "w00001"], k=5, probe_blocks=1).toPandas()
    exp = search(bidx, "w00000 OR w00001", k=5).toPandas()
    assert list(got["docint"]) == list(exp["docint"])
