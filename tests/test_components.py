"""Connected components + sampling operators (training-pipeline ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _cc(spark, edges):
    from miru_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def test_cc_basic(spark):
    # two components: {1,2,3} (chain) and {7,8}
    got = _cc(spark, [(1, 2), (2, 3), (7, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_cc_long_chain_converges(spark):
    # pointer jumping must close a 40-node path in O(log d) rounds
    edges = [(i, i + 1) for i in range(40)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_cc_dense_clique_and_singleton_edge(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges.append((100, 200))
    got = _cc(spark, edges)
    assert all(got[i] == 0 for i in range(5))
    assert got[100] == got[200] == 100


def test_canonical_and_dedup_corpus(spark):
    from miru_spark.operators.components import canonical_docs, dedup_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    m = {r["doc_id"]: (r["canonical_id"], r["is_kept"])
         for r in canonical_docs(edges).collect()}
    assert m == {0: (0, True), 1: (0, False), 2: (0, False),
                 4: (4, True), 5: (4, False)}
    kept = sorted(r["doc_id"] for r in dedup_corpus(docs, edges).collect())
    # doc 3 has no edges -> kept implicitly; 1,2,5 dropped
    assert kept == [0, 3, 4]


def test_hash_split_deterministic_and_proportional(spark):
    from miru_spark.operators.sampling import hash_split

    docs = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, w).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert sum(counts.values()) == 20000
    assert counts["train"] == pytest.approx(16000, rel=0.05)
    assert counts["val"] == pytest.approx(2000, rel=0.15)
    # same assignment on re-run and on a differently-partitioned input
    b = hash_split(docs.repartition(17), w)
    joined = hash_split(docs, w).alias("x").join(
        b.alias("y"), "doc_id"
    ).where(F.col("x.split") != F.col("y.split"))
    assert joined.count() == 0


def test_hash_split_stable_under_growth(spark):
    from miru_spark.operators.sampling import hash_split

    small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    sa = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
    sb = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
    assert all(sb[k] == v for k, v in sa.items())


def test_stratified_sample_rates(spark):
    from miru_spark.operators.sampling import stratified_sample

    docs = spark.range(0, 30000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "zh")
        .otherwise("de")
        .alias("lang"),
    )
    out = stratified_sample(
        docs, rates={"en": 0.5, "zh": 1.0}, strata_col="lang", default_rate=0.0
    )
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts["zh"] == 10000
    assert counts["en"] == pytest.approx(5000, rel=0.05)
    assert "de" not in counts


def test_mixture_sample_targets_token_mass(spark):
    from miru_spark.operators.sampling import mixture_sample, mixture_thresholds

    docs = spark.range(0, 30000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "code")
        .otherwise("books")
        .alias("source"),
        F.lit(100).cast("bigint").alias("n_tokens"),
    )
    # 1M tokens per source; recipe: web 50%, code 25% of a 1M budget
    out = mixture_sample(
        docs, weights={"web": 0.5, "code": 0.25}, budget_tokens=1_000_000
    )
    mass = {
        r["source"]: r["sum(n_tokens)"]
        for r in out.groupBy("source").sum("n_tokens").collect()
    }
    assert "books" not in mass  # unlisted stratum dropped
    assert mass["web"] == pytest.approx(500_000, rel=0.05)
    assert mass["code"] == pytest.approx(250_000, rel=0.05)
    # clamp: target above stratum size keeps everything, deterministically
    clamped = mixture_sample(docs, weights={"web": 5.0}, budget_tokens=1_000_000)
    assert clamped.count() == 10000
    # re-run + repartition give the identical row set
    again = mixture_sample(
        docs.repartition(13), weights={"web": 0.5, "code": 0.25},
        budget_tokens=1_000_000,
    )
    assert again.select("doc_id").exceptAll(out.select("doc_id")).count() == 0
    # threshold math is the documented half-up bucket bound
    thr = mixture_thresholds({"web": 1_000_000}, {"web": 0.5}, 1_000_000)
    assert thr == {"web": 5000}


def test_ngram_jaccard_delta_equals_filtered_full(spark):
    from miru_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_delta,
    )

    # near-dup clusters: docs i and i+100 share most tokens
    rows = []
    for i in range(40):
        base = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((i, base))
        rows.append((i + 100, base + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    delta = docs.where(F.col("doc_id") >= 100).select(
        F.col("doc_id").alias("id")
    )
    full = ngram_jaccard_pairs(docs, k=3, threshold=0.3, max_df=None)
    exp = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in full.collect()
        if r["id_a"] >= 100 or r["id_b"] >= 100
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs_delta(
            docs, delta, k=3, threshold=0.3, max_df=None
        ).collect()
    )
    assert got == exp and len(got) > 0
