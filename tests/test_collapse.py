"""Field-collapsed top-k (query/collapse.py) vs the pandas oracle."""

from __future__ import annotations

import pytest

from miru_spark.index import InvertedIndex
from miru_spark.oracle import PandasIndex
from miru_spark.query.collapse import search_collapse

QUERIES = [
    "w00000",
    "w00001 OR w00004",
    "w00002 AND w00005",
    "w0001*",
    "role:assistant AND w00007",
    "w00001 AND NOT w00002",
]


@pytest.fixture(scope="module")
def built(small_turns, small_pdf):
    idx = InvertedIndex.build(small_turns)
    oracle = PandasIndex(small_pdf)
    yield idx, oracle
    idx.unpersist()


def _oracle_collapse(oracle: PandasIndex, query: str, k: int):
    # every scored match (oracle.search already orders by score desc,
    # docint desc), first row per conv = its best representative
    full = oracle.search(query, k=oracle.n_docs)
    best = full.drop_duplicates("conv_id", keep="first")
    return best.head(k).reset_index(drop=True)


@pytest.mark.parametrize("query", QUERIES)
def test_collapse_rank_identical(built, query):
    idx, oracle = built
    got = search_collapse(idx, query, k=10, group_col="conv_id").toPandas()
    exp = _oracle_collapse(oracle, query, 10)
    assert list(got["docint"]) == list(exp["docint"]), query
    assert list(got["conv_id"]) == list(exp["conv_id"]), query
    for g, e in zip(got["score"], exp["score"]):
        assert abs(g - e) < 1e-6, query


def test_collapse_one_row_per_group(built):
    idx, _ = built
    got = search_collapse(idx, "w00000 OR w00001", k=50).toPandas()
    assert got["conv_id"].is_unique
    # representative is a genuine member of its conversation
    assert (got["turn_idx"] >= 0).all()


def test_collapse_respects_ts_mask(built, small_pdf):
    idx, oracle = built
    ts_hi = small_pdf["ts"].quantile(0.5)
    got = search_collapse(idx, "w00000", k=10, ts_hi=ts_hi).toPandas()
    full = oracle.search("w00000", k=oracle.n_docs, ts_hi=ts_hi)
    exp = full.drop_duplicates("conv_id", keep="first").head(10)
    assert list(got["docint"]) == list(exp["docint"])


def test_grouped_topn_vs_oracle(built):
    from miru_spark.query.collapse import search_grouped

    idx, oracle = built
    got = search_grouped(
        idx, "w00000 OR w00001", k_groups=5, per_group=2
    ).toPandas()
    full = oracle.search("w00000 OR w00001", k=oracle.n_docs)
    # groups ranked by their best member (collapse order)
    best = full.drop_duplicates("conv_id", keep="first").head(5)
    grp_rank = {c: i + 1 for i, c in enumerate(best["conv_id"])}
    exp = full[full["conv_id"].isin(grp_rank)].copy()
    exp["grp_rank"] = exp["conv_id"].map(grp_rank)
    exp["doc_rank"] = exp.groupby("conv_id").cumcount() + 1
    exp = exp[exp["doc_rank"] <= 2].sort_values(["grp_rank", "doc_rank"])
    assert list(got["docint"]) == list(exp["docint"])
    assert list(got["grp_rank"]) == list(exp["grp_rank"])
    assert list(got["doc_rank"]) == list(exp["doc_rank"])
    for g, e in zip(got["score"], exp["score"]):
        assert abs(g - e) < 1e-6


def test_spell_correct_ranking(built):
    from miru_spark.query.suggest import spell_correct

    idx, oracle = built
    # corpus vocabulary is w00000..w09999 (+ role terms); a typo of a
    # dictionary word must surface the word at distance 1, popular
    # (low-numbered, Zipf) terms first on ties
    got = spell_correct(idx, "w0000", max_dist=1, k=10).toPandas()
    assert "w00000" in set(got["term"])
    assert (got["dist"] <= 1).all()
    # ranking: distance asc, then df desc, then term asc
    key = list(zip(got["dist"], -got["df"], got["term"]))
    assert key == sorted(key)


def test_spell_correct_no_match(built):
    from miru_spark.query.suggest import spell_correct

    idx, _ = built
    assert spell_correct(idx, "zzzzzzzzzz", max_dist=2, k=5).count() == 0
