"""Hybrid BM25 + embedding rerank (query/hybrid.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.oracle import PandasIndex
from miru_spark.query.hybrid import search_hybrid


@pytest.fixture(scope="module")
def built(small_turns, small_pdf):
    idx = InvertedIndex.build(small_turns)
    oracle = PandasIndex(small_pdf)
    yield idx, oracle
    idx.unpersist()


def _emb_for(spark, docints, dim=4):
    # deterministic unit-ish vectors keyed on docint; docint % 3 == 0 has
    # no embedding row (exercises the left-join zero-cosine path)
    rows = [
        (int(d), [math.sin(d + i) for i in range(dim)])
        for d in docints
        if d % 3 != 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hybrid_blend_matches_python(built, spark):
    idx, oracle = built
    full = oracle.search("w00000 OR w00001", k=50)
    emb = _emb_for(spark, full["docint"].tolist())
    qv = [1.0, 0.5, -0.5, 0.25]

    got = search_hybrid(
        idx,
        "w00000 OR w00001",
        emb,
        qv,
        key_expr=F.col("docint"),
        k=10,
        candidates=50,
        alpha=0.7,
    ).toPandas()

    # python oracle: same pool, same blend
    vecs = {
        int(r["vec_id"]): list(r["embedding"]) for r in emb.collect()
    }

    def cos(v):
        num = sum(a * b for a, b in zip(v, qv))
        den = math.sqrt(sum(a * a for a in v)) * math.sqrt(
            sum(b * b for b in qv)
        )
        return num / den

    exp = []
    for r in full.to_dict("records"):
        c = cos(vecs[r["docint"]]) if r["docint"] in vecs else 0.0
        exp.append((r["docint"], 0.7 * r["score"] + 0.3 * c))
    exp.sort(key=lambda x: (-x[1], -x[0]))
    exp = exp[:10]

    assert list(got["docint"]) == [d for d, _ in exp]
    for g, (_, h) in zip(got["hybrid"], exp):
        assert abs(g - h) < 1e-6
    # missing-embedding hits survive with cosine exactly 0
    miss = got[got["docint"] % 3 == 0]
    assert (miss["cosine"] == 0.0).all()


def test_hybrid_alpha_one_is_bm25(built, spark):
    idx, oracle = built
    full = oracle.search("w00002", k=20)
    emb = _emb_for(spark, full["docint"].tolist())
    got = search_hybrid(
        idx, "w00002", emb, [1.0, 0.0, 0.0, 0.0],
        key_expr=F.col("docint"), k=10, candidates=20, alpha=1.0,
    ).toPandas()
    exp = oracle.search("w00002", k=10)
    assert list(got["docint"]) == list(exp["docint"])
    for g, e in zip(got["bm25"], exp["score"]):
        assert abs(g - e) < 1e-6


def _py_mmr(rows, qv, k, lam, alpha):
    # pure-python MMR reference (same recurrence, same tie-break)
    import math

    def cos(a, b):
        if a is None or b is None:
            return 0.0
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / max(den, 1e-12)

    rel = [alpha * s + (1 - alpha) * cos(v, qv) for _, s, v in rows]
    sel, remaining, picks = [], list(range(len(rows))), []
    for _ in range(min(k, len(rows))):
        vals = []
        for i in remaining:
            pen = max((cos(rows[i][2], rows[j][2]) for j in sel), default=0.0)
            vals.append((lam * rel[i] - (1 - lam) * pen, rows[i][0], i))
        vals.sort(key=lambda t: (-t[0], -t[1]))
        _, _, best = vals[0]
        sel.append(best)
        remaining.remove(best)
        picks.append(rows[best][0])
    return picks


def test_mmr_matches_python_reference(built, spark):
    from miru_spark.query.hybrid import search_mmr

    idx, oracle = built
    full = oracle.search("w00000 OR w00001", k=30)
    emb = _emb_for(spark, full["docint"].tolist())
    qv = [0.3, -0.2, 0.9, 0.1]
    got = search_mmr(
        idx, "w00000 OR w00001", emb, qv,
        key_expr=F.col("docint"), k=8, candidates=30, lam=0.6, alpha=0.5,
    ).toPandas()

    vecs = {int(r["vec_id"]): list(r["embedding"]) for r in emb.collect()}
    rows = [
        (int(r["docint"]), float(r["score"]), vecs.get(int(r["docint"])))
        for r in full.to_dict("records")
    ]
    exp = _py_mmr(rows, qv, 8, 0.6, 0.5)
    assert list(got["docint"]) == exp
    assert list(got["rank"]) == list(range(1, len(exp) + 1))


def test_mmr_diversifies(built, spark):
    # two candidates with identical embeddings: MMR must not pick both
    # early, while plain hybrid would rank them adjacent
    from miru_spark.query.hybrid import search_mmr

    idx, oracle = built
    full = oracle.search("w00002", k=10)
    ids = full["docint"].tolist()
    same = [1.0, 0.0, 0.0, 0.0]
    rows = [(int(d), same if i < 2 else [0.0, 1.0, float(i), 0.0]) for i, d in enumerate(ids)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = search_mmr(
        idx, "w00002", emb, same,
        key_expr=F.col("docint"), k=len(ids), candidates=10, lam=0.5, alpha=0.0,
    ).toPandas()
    # the twin of the first pick is penalized: it cannot be rank 2
    first_two = set(got.head(2)["docint"])
    assert not set(ids[:2]).issubset(first_two)


def test_rrf_fusion_matches_python(built, spark):
    from miru_spark.query.hybrid import search_rrf

    idx, oracle = built
    full = oracle.search("w00000 OR w00001", k=20)
    ids = full["docint"].tolist()
    emb_rows = [
        (int(d), [math.sin(d + i) for i in range(4)]) for d in ids
    ] + [(999999, [1.0, 0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")

    got = search_rrf(
        idx, "w00000 OR w00001", emb, query_id=999999,
        key_expr=F.col("docint"), k=10, candidates=20,
    ).toPandas()

    # python reference
    bm_rank = {d: i + 1 for i, d in enumerate(ids[:20])}
    qv = [1.0, 0.0, 0.0, 0.0]

    def cos(v):
        num = sum(a * b for a, b in zip(v, qv))
        den = math.sqrt(sum(a * a for a in v))
        return round(num / den, 4)  # cosine_topk rounds before ranking

    by_cos = sorted(
        ((cos(v), d) for d, v in emb_rows if d != 999999),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    vec_rank = {d: i + 1 for i, (_, d) in enumerate(by_cos)}
    fused = {}
    for d in set(bm_rank) | set(vec_rank):
        fused[d] = (1 / (60 + bm_rank[d]) if d in bm_rank else 0) + (
            1 / (60 + vec_rank[d]) if d in vec_rank else 0
        )
    exp = sorted(fused.items(), key=lambda t: (-t[1], -t[0]))[:10]
    assert list(got["docint"]) == [d for d, _ in exp]
    for g, (_, r) in zip(got["rrf"], exp):
        assert abs(g - r) < 1e-9
