"""Plan chooser: picks by posting-mass estimate, rank-identical output."""

import pytest

from miru_spark.index import InvertedIndex
from miru_spark.query.bm25 import search
from miru_spark.query.parser import parse_query
from miru_spark.query.serve import choose_plan, search_auto


@pytest.fixture(scope="module")
def bidx(spark, small_turns, tmp_path_factory):
    p = tmp_path_factory.mktemp("serve") / "seg"
    idx = InvertedIndex.build_persisted(small_turns, str(p), blocks=True)
    idx.terms = idx.terms.cache()
    idx.terms.count()
    return idx


def test_choose_plan_thresholds(bidx):
    and_q = parse_query("w00000 AND w00001")
    or_q = parse_query("w00000 OR w00001")
    # tiny corpus: flat everywhere at default thresholds
    assert choose_plan(bidx, and_q) == "flat"
    assert choose_plan(bidx, or_q) == "flat"
    # force the block paths by lowering the bars
    assert choose_plan(bidx, and_q, and_min_postings=1) == "blocks_and"
    assert choose_plan(bidx, or_q, or_wand_min_postings=1) == "blocks_or"
    # non-fusable / prefix queries always serve flat
    assert choose_plan(bidx, parse_query("w00000 AND NOT w00001")) == "flat"
    assert choose_plan(bidx, parse_query("w0000*"), and_min_postings=1) == "flat"


def test_search_auto_rank_identical(bidx):
    for q, kw in [
        ("w00000 AND w00001", dict(and_min_postings=1)),
        ("w00000 OR w00001", dict(or_wand_min_postings=1)),
        ("w00000 AND w00001", dict()),  # flat path via default threshold
    ]:
        got = search_auto(bidx, q, k=10, **kw).toPandas()
        exp = search(bidx, q, k=10).toPandas()
        assert list(got["docint"]) == list(exp["docint"]), (q, kw)
        assert (got["score"] - exp["score"]).abs().max() < 1e-9
