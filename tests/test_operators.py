"""Training-data pipeline operators: invariants + ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_self_consistency(documents):
    from miru_spark.operators.dedup import exact_dup_groups

    g = exact_dup_groups(documents).toPandas()
    assert g["n_docs"].sum() == documents.count()
    # duplicating the corpus doubles every group size, same keep ids
    doubled = documents.unionByName(
        documents.withColumn("doc_id", F.col("doc_id") + 10_000)
    )
    g2 = exact_dup_groups(doubled).toPandas()
    assert (g2["n_docs"] >= 2).all()
    assert set(g2["keep_id"]) == set(g["keep_id"])  # min ids unchanged


def test_minhash_lsh_recall_vs_exact(documents):
    """LSH candidates must recover most true near-dup pairs (J ≥ .5)."""
    from miru_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(documents, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(documents, threshold=0.5).collect()
    }
    assert lsh <= exact  # verify step guarantees no false positives
    if exact:
        assert len(lsh) / len(exact) >= 0.8  # recall of the banded probe


def test_simhash_near_dup_property(spark):
    """Docs differing by one token get Hamming-close simhashes;
    unrelated docs don't."""
    from miru_spark.operators.dedup import simhash

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy cat near the river bank"),
        (2, "completely different content about spark shuffle partitions and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    ham01 = bin(s[0] ^ s[1]).count("1")
    ham02 = bin(s[0] ^ s[2]).count("1")
    assert ham01 < ham02
    assert ham01 <= 8


def test_lsh_topk_recall(embeddings):
    from miru_spark.operators.similarity import cosine_topk, lsh_bucket_topk

    exact = [r["vec_id"] for r in cosine_topk(embeddings, 0, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_bucket_topk(embeddings, 0, k=10).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.5, f"ANN recall too low: {overlap}"
    # scores of returned neighbors must be exact (probed set is scored
    # exactly — approximation is only in candidate selection)
    ec = {r["vec_id"]: r["cosine"] for r in cosine_topk(embeddings, 0, k=200).collect()}
    for r in lsh_bucket_topk(embeddings, 0, k=10).collect():
        assert abs(ec[r["vec_id"]] - r["cosine"]) < 1e-9


def test_ivf_topk_recall(embeddings):
    from miru_spark.operators.similarity import IvfIndex, cosine_topk

    idx = IvfIndex.build(embeddings, n_lists=16)
    idx.assignments = idx.assignments.cache()
    exact = [r["vec_id"] for r in cosine_topk(embeddings, 0, k=10).collect()]
    approx = [r["vec_id"] for r in idx.topk(embeddings, 0, k=10, nprobe=6).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.5, f"IVF recall too low: {overlap}"
    # exact scores within the probed set
    ec = {r["vec_id"]: r["cosine"] for r in cosine_topk(embeddings, 0, k=500).collect()}
    for r in idx.topk(embeddings, 0, k=10, nprobe=6).collect():
        assert abs(ec[r["vec_id"]] - r["cosine"]) < 1e-9
    # nprobe = n_lists probes everything -> recall 1.0 (exact fallback)
    full = [r["vec_id"] for r in idx.topk(embeddings, 0, k=10, nprobe=16).collect()]
    assert full == exact


def test_ivf_assignments_cover_corpus(embeddings):
    from miru_spark.operators.similarity import IvfIndex

    idx = IvfIndex.build(embeddings, n_lists=8)
    n = embeddings.count()
    a = idx.assignments.cache()
    assert a.count() == n  # every vector in exactly one list
    assert a.select("vec_id").distinct().count() == n
    n_lists_used = a.select("list").distinct().count()
    assert n_lists_used >= 4  # centroids spread, not collapsed


def test_ivf_save_load_roundtrip(embeddings, tmp_path):
    import numpy as np

    from miru_spark.operators.similarity import IvfIndex

    idx = IvfIndex.build(embeddings, n_lists=8)
    path = str(tmp_path / "ivf")
    idx.save(path)
    idx2 = IvfIndex.load(embeddings.sparkSession, path)
    assert np.allclose(idx.centroids, idx2.centroids)
    got = [r["vec_id"] for r in idx2.topk(embeddings, 0, k=5, nprobe=4).collect()]
    exp = [r["vec_id"] for r in idx.topk(embeddings, 0, k=5, nprobe=4).collect()]
    assert got == exp


def test_multimodal_plumbing(spark, documents):
    from miru_spark.operators.multimodal import (
        documents_as_binary,
        extract_features,
    )

    feats = extract_features(documents_as_binary(documents))
    pdf = feats.toPandas()
    assert len(pdf) == documents.count()
    assert (pdf["n_bytes"] > 0).all()
    assert ((pdf["width"] >= 1) & (pdf["width"] <= 1920)).all()
    assert ((pdf["height"] >= 1) & (pdf["height"] <= 1080)).all()
    # deterministic: same payload → same features
    pdf2 = feats.toPandas()
    assert pdf.sort_values("id").equals(pdf2.sort_values("id"))


def test_image_header_parse_roundtrip():
    from miru_spark.operators.multimodal import (
        parse_image_header,
        synth_image_payload,
    )

    for kind in ("png", "gif", "jpeg"):
        for w, h in [(1, 1), (16, 480), (640, 16), (1920, 1080), (65535, 1)]:
            got = parse_image_header(synth_image_payload(kind, w, h))
            assert got == (w, h, kind), (kind, w, h, got)
    # adversarial / non-image bytes → None (fake-geometry fallback)
    assert parse_image_header(None) is None
    assert parse_image_header(b"") is None
    assert parse_image_header(b"plain text payload") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) is None
    assert parse_image_header(b"\xff\xd8\x00\x00\x00\x00") is None  # desync
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x01") is None  # len<2
    # truncated SOF
    trunc = synth_image_payload("jpeg", 9, 9, pad_to=0)[:25]
    assert parse_image_header(trunc) is None
    # JPEG with fill bytes and a restart marker before SOF still parses
    weird = (
        b"\xff\xd8\xff\xff\xd0"
        + synth_image_payload("jpeg", 33, 44, pad_to=0)[2:]
    )
    assert parse_image_header(weird) == (33, 44, "jpeg")


def test_multimodal_real_decode(spark, documents):
    from miru_spark.operators.multimodal import (
        documents_as_images,
        extract_features,
    )

    pdf = extract_features(documents_as_images(documents)).toPandas()
    assert set(pdf["fmt"]) == {"png", "gif", "jpeg"}
    assert (pdf["width"] == 16 + pdf["id"] % 640).all()
    assert (pdf["height"] == 16 + (pdf["id"] * 7) % 480).all()
    assert (pdf["n_bytes"] == 64).all()


def test_wav_header_parse_roundtrip():
    from miru_spark.operators.multimodal import (
        parse_wav_header,
        synth_wav_payload,
    )

    for rate, ch, bits, ns in [
        (8000, 1, 8, 1000),
        (16000, 2, 16, 44100),
        (44100, 2, 16, 1),
        (48000, 1, 16, 123456),
    ]:
        got = parse_wav_header(synth_wav_payload(rate, ch, bits, ns))
        assert got == (rate, ch, bits, ns)
    assert parse_wav_header(None) is None
    assert parse_wav_header(b"RIFFxxxxWAVE") is None  # no chunks
    assert parse_wav_header(b"not audio at all") is None
    # data chunk before fmt -> n_samples unknown at that point; a second
    # data chunk after fmt resolves (chunk-walk order independence for
    # the common LIST-prefixed layouts)
    from miru_spark.operators.multimodal import synth_wav_payload as s

    wav = s(8000, 1, 8, 10)
    # inject a junk odd-sized chunk between fmt and data (word-aligned walk)
    junk = b"junk" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    patched = wav[:36] + junk + wav[36:]
    assert parse_wav_header(patched) == (8000, 1, 8, 10)


def test_resize_geometry_and_frame_sampling(spark):
    from miru_spark.operators.multimodal import (
        resize_geometry,
        sample_frame_indices,
    )

    feats = spark.createDataFrame(
        [(1, 1920, 1080, "png"), (2, 100, 50, "gif"), (3, 16, 512, "jpeg")],
        "id long, width int, height int, fmt string",
    )
    rows = {r["id"]: (r["out_w"], r["out_h"]) for r in
            resize_geometry(feats, 256, 256).collect()}
    assert rows[1] == (256, 144)  # downscale, aspect kept
    assert rows[2] == (100, 50)  # never upscale
    assert rows[3] == (8, 256)  # tall clamp, floor >= 1

    videos = spark.createDataFrame(
        [(1, 3500, 24), (2, 0, 30), (3, 999, 30)],
        "id long, duration_ms long, fps int",
    )
    out = sample_frame_indices(videos, every_ms=1000).collect()
    got = {}
    for r in out:
        got.setdefault(r["id"], []).append(r["frame_idx"])
    assert sorted(got[1]) == [0, 24, 48, 72]  # one per second
    assert sorted(got[2]) == [0] and sorted(got[3]) == [0]


def test_shingle_short_doc_guard(spark):
    from miru_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(0, "one two"), (1, "a"), (2, ""), (3, "a b c d")],
        "doc_id long, text string",
    )
    sh = shingles(df, k=3).collect()
    by_id: dict[int, list[str]] = {}
    for r in sh:
        by_id.setdefault(r["id"], []).append(r["shingle"])
    assert 0 not in by_id and 1 not in by_id and 2 not in by_id
    assert sorted(by_id[3]) == ["a b c", "b c d"]


def test_embedding_dedup_lsh_matches_exact(embeddings):
    """The LSH-bucketed dedup (band equi-join, no crossJoin) must equal
    the exact all-pairs twin at test scale: the verify step guarantees
    no false positives; params (b=4, L=24) are tuned for recall 1.0."""
    from miru_spark.operators.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_lsh,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_dup_pairs(embeddings, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_dup_pairs_lsh(embeddings, threshold=0.4).collect()
    }
    assert lsh == exact
    assert len(exact) > 0


def test_strut_strategy_validated():
    """strut_score rejects unknown fold strategies before any Spark work
    (Strategy.java enum: UNIT_WEIGHTED / REGRESSION_WEIGHTED / MAX)."""
    import pytest

    from miru_spark.operators.strut import STRATEGIES, strut_score

    assert set(STRATEGIES) == {"unit_weighted", "regression_weighted", "max"}
    with pytest.raises(ValueError, match="strategy must be one of"):
        strut_score(None, None, None, strategy="harmonic")


def test_exact_dup_pairs_guard_trips(embeddings, monkeypatch):
    """The O(n²) all-pairs baseline refuses corpora over the guard bound
    unless unsafe_exact=True — nothing should be able to crossJoin a
    real corpus by accident."""
    import pytest

    from miru_spark.operators import similarity
    from miru_spark.operators.similarity import cosine_dup_pairs

    monkeypatch.setattr(similarity, "EXACT_PAIRS_MAX_ROWS", 1)
    with pytest.raises(ValueError, match="O\\(n²\\) exact baseline"):
        cosine_dup_pairs(embeddings, threshold=0.4)
    # the escape hatch still works
    assert cosine_dup_pairs(embeddings, threshold=0.4, unsafe_exact=True).count() > 0


def test_lsh_index_save_load_roundtrip(spark, embeddings, tmp_path):
    """Persisted ANN index: save/load preserves probe results, and the
    probe touches the assignments relation by key — never re-hashing
    the corpus at query time."""
    from miru_spark.operators.similarity import LshIndex, cosine_topk

    idx = LshIndex.build(embeddings, n_bits=6, n_tables=8)
    r1 = [(r["vec_id"], r["cosine"]) for r in idx.topk(embeddings, 0, k=10).collect()]
    idx.save(str(tmp_path / "lsh"))
    idx2 = LshIndex.load(spark, str(tmp_path / "lsh"))
    r2 = [(r["vec_id"], r["cosine"]) for r in idx2.topk(embeddings, 0, k=10).collect()]
    assert r1 == r2
    # recall sanity vs brute force on the persisted index
    exact = [r["vec_id"] for r in cosine_topk(embeddings, 0, k=10).collect()]
    overlap = len(set(exact) & {v for v, _ in r2}) / 10
    assert overlap >= 0.5


def test_ngram_jaccard_stop_shingle_cap(spark):
    """Skew fixture: one viral shingle shared by EVERY doc. The default
    df cap keeps the candidate join sub-quadratic and must not change
    the result set (true near-dups share many rare shingles)."""
    from miru_spark.operators.dedup import ngram_jaccard_pairs, shingles

    viral = "lorem ipsum dolor"
    rows = [
        (i, f"{viral} unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e")
        for i in range(150)
    ]
    # one true near-dup pair sharing rare shingles
    rows.append((900, f"{viral} alpha beta gamma delta epsilon zeta"))
    rows.append((901, f"{viral} alpha beta gamma delta epsilon eta"))
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()

    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.4, max_df=10).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.4, max_df=None).collect()
    }
    assert (900, 901) in capped
    assert capped == exact
    # candidate join boundedness: with the cap, the viral shingle is out
    # of the join, so candidates collapse from ~n^2/2 to the rare-shingle
    # pairs only (same join formula the operator uses)
    sh = shingles(df).cache()
    hot = (
        sh.groupBy("shingle").count().where("count > 10").select("shingle")
    )
    capped_sh = sh.join(hot, "shingle", "left_anti")
    n_cand = (
        capped_sh.alias("a")
        .join(capped_sh.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select("a.id", "b.id")
        .distinct()
        .count()
    )
    assert n_cand < 100  # uncapped would be ~152*151/2 ≈ 11k
    df.unpersist()


def test_simhash_pair_join_pigeonhole(documents):
    """Band candidate generation has guaranteed recall for
    max_hamming < n_bands: pairs must equal the brute-force popcount."""
    from miru_spark.operators.dedup import simhash, simhash_dup_pairs

    sigs = {r["id"]: r["simhash"] for r in simhash(documents).collect()}
    ids = sorted(sigs)
    exact = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 2
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dup_pairs(documents, max_hamming=2).collect()
    }
    assert got == exact
    assert len(exact) > 0


def test_pack_chunks_layout(documents):
    """Concat-and-chunk packing: offsets are a prefix sum in id order,
    seq ids are consistent with the budget, and the distributed result
    equals a single-threaded pandas recomputation."""
    from miru_spark.operators.packing import pack_chunks
    from miru_spark.operators.textstats import token_counts

    budget = 512
    toks = token_counts(documents).select("id", "n_tokens")
    got = (
        pack_chunks(toks, budget=budget, id_col="id")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = toks.toPandas().sort_values("id").reset_index(drop=True)
    starts = exp["n_tokens"].cumsum().shift(1, fill_value=0).astype("int64")
    assert got["start"].tolist() == starts.tolist()
    assert (got["seq_id"] == got["start"] // budget).all()
    assert (got["seq_off"] == got["start"] % budget).all()
    nz = got[got["n_tokens"] > 0]
    assert (
        nz["seq_last"] == (nz["start"] + nz["n_tokens"] - 1) // budget
    ).all()
    # a doc never ends before it starts
    assert (got["seq_last"] >= got["seq_id"]).all()


def test_pack_greedy_invariants(documents):
    """No-split greedy packing: every pack fits the budget (unless a
    single doc exceeds it), packs are contiguous in id order within a
    group, and every doc is packed exactly once."""
    from miru_spark.operators.packing import pack_greedy
    from miru_spark.operators.textstats import token_counts

    budget = 900
    toks = token_counts(documents).select("id", "n_tokens").withColumn(
        "grp", (F.col("id") % 7).cast("string")
    )
    got = pack_greedy(
        toks, budget=budget, group_col="grp", id_col="id"
    ).toPandas()
    assert len(got) == toks.count()  # every doc packed once
    sizes = got.groupby(["group", "pack_idx"])["n_tokens"].sum()
    singles = got.groupby(["group", "pack_idx"])["n_tokens"].count()
    over = sizes[sizes > budget]
    # an over-budget pack is only ever a single over-long doc
    assert (singles.loc[over.index] == 1).all()
    for (_, _), sub in got.groupby(["group", "pack_idx"]):
        sub = sub.sort_values("id")
        offs = sub["n_tokens"].cumsum().shift(1, fill_value=0)
        assert sub["pack_off"].tolist() == offs.tolist()
    # pack indices contiguous from 0 and non-decreasing in id order
    for _, sub in got.groupby("group"):
        sub = sub.sort_values("id")
        pk = sub["pack_idx"].tolist()
        assert pk[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(pk, pk[1:]))


def test_ngram_repetition_signals(documents, spark):
    """Duplicate-n-gram quality signals: ratio bounds, and a corpus of
    one doc repeated twice drives cross_dup_frac to 1.0 while a
    singleton all-unique doc stays at 0.0."""
    from miru_spark.operators.textstats import ngram_repetition

    got = ngram_repetition(documents, n=3).toPandas()
    assert len(got) == documents.count()
    assert got["rep_ratio"].between(0, 1).all()
    assert got["cross_dup_frac"].between(0, 1).all()
    assert (got.loc[got["n_ngrams"] == 0, "rep_ratio"] == 0).all()

    tiny = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    t = (
        ngram_repetition(tiny, n=3)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert t.loc[1, "cross_dup_frac"] == 1.0  # twin doc: every gram shared
    assert t.loc[2, "cross_dup_frac"] == 1.0
    assert t.loc[3, "cross_dup_frac"] == 0.0  # unique doc: nothing shared
    assert (t["rep_ratio"] == 0.0).all()  # no within-doc repeats


def test_bpe_token_estimate(spark):
    """BPE-ish piece count: contractions split, punctuation runs are one
    piece, and pieces_per_word >= 1 whenever words exist."""
    from miru_spark.operators.textstats import bpe_token_estimate

    tiny = spark.createDataFrame(
        [
            (1, "don't stop"),
            (2, "hello world!!!"),
            (3, "x2 tokens123 mix"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = bpe_token_estimate(tiny).toPandas().set_index("id").sort_index()
    # don't -> don / 't ; stop -> _stop  => 3 pieces, 2 ws tokens
    assert got.loc[1, "n_ws_tokens"] == 2 and got.loc[1, "n_bpe_pieces"] == 3
    # hello world!!! -> hello / _world / !!!  => 3 pieces
    assert got.loc[2, "n_bpe_pieces"] == 3
    # x2 -> x / 2 ; tokens123 -> _tokens / 123 ; mix -> _mix => 5
    assert got.loc[3, "n_bpe_pieces"] == 5
    assert got.loc[4, "n_ws_tokens"] == 0 and got.loc[4, "pieces_per_word"] == 0.0
    assert (got.loc[got["n_ws_tokens"] > 0, "pieces_per_word"] >= 1).all()


def test_decontaminate(spark, documents):
    """N-gram decontamination: a training doc containing a benchmark
    5-gram is flagged; disjoint docs and sub-n docs are not; and the
    broadcast / shuffle join variants agree."""
    from miru_spark.operators.textstats import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "pre beta gamma delta epsilon zeta post"),  # shares a 5-gram
            (2, "beta gamma delta epsilon"),  # only 4 tokens: zero grams
            (3, "one two three four five six seven"),  # disjoint
        ],
        "doc_id long, text string",
    )
    got = decontaminate(train, bench, n=5).toPandas().set_index("id").sort_index()
    assert bool(got.loc[1, "contaminated"]) and got.loc[1, "n_hit"] == 1
    assert got.loc[2, "n_grams"] == 0 and not bool(got.loc[2, "contaminated"])
    assert not bool(got.loc[3, "contaminated"]) and got.loc[3, "n_grams"] == 3

    # shuffle fallback is result-identical on the real corpus
    b = documents.where(F.col("doc_id") % 20 == 0)
    t = documents.where(F.col("doc_id") % 20 != 0)
    a = decontaminate(t, b, n=5).toPandas().sort_values("id").reset_index(drop=True)
    s = (
        decontaminate(t, b, n=5, broadcast_bench=False)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert a.equals(s)


def test_contamination_report(spark, documents):
    """Per-bench-doc leak diagnostics agree with decontaminate's
    training-side flags: total training docs hit is consistent, and a
    fully-leaked bench doc reports leak_frac 1.0."""
    from miru_spark.operators.textstats import contamination_report, decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"), (101, "qq ww ee rr tt yy")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta"),
         (2, "prefix alpha beta gamma delta epsilon end")],
        "doc_id long, text string",
    )
    rep = (
        contamination_report(train, bench, n=5)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    # bench 100 has 2 distinct 5-grams, both present in training
    assert rep.loc[100, "n_grams"] == 2 and rep.loc[100, "n_leaked"] == 2
    assert rep.loc[100, "leak_frac"] == 1.0 and rep.loc[100, "n_train_docs"] == 2
    assert rep.loc[101, "n_leaked"] == 0 and rep.loc[101, "leak_frac"] == 0.0

    # cross-check vs decontaminate on the real corpus: a training doc is
    # flagged iff it appears in some bench doc's n_train_docs tally
    b = documents.where(F.col("doc_id") % 20 == 0)
    t = documents.where(F.col("doc_id") % 20 != 0)
    n_flagged = decontaminate(t, b, n=5).where("contaminated").count()
    rep2 = contamination_report(t, b, n=5).toPandas()
    assert (rep2["n_train_docs"] > 0).any() == (n_flagged > 0)


def test_weighted_sample(documents, spark):
    """Per-row Bernoulli keyed on the hashed id: deterministic across
    runs, monotone in probability, prob 0 keeps nothing, prob 1 keeps
    everything, and adding docs never flips existing decisions."""
    from miru_spark.operators.sampling import weighted_sample

    d = documents.withColumn("p", (F.col("doc_id") % 100) / 100.0)
    kept = weighted_sample(d, "p").select("doc_id")
    a = {r["doc_id"] for r in kept.collect()}
    assert a == {r["doc_id"] for r in kept.collect()}  # deterministic
    assert weighted_sample(d, F.lit(0.0)).count() == 0
    assert weighted_sample(d, F.lit(1.0)).count() == documents.count()
    lo = {r["doc_id"] for r in weighted_sample(d, F.col("p") * 0.5).select("doc_id").collect()}
    assert lo <= a  # monotone: lower prob keeps a subset
    # growth-stable: a superset corpus keeps the same original rows
    grown = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 10_000))
    g = {r["doc_id"] for r in weighted_sample(grown, "p").select("doc_id").collect()}
    assert {x for x in g if x < 10_000} == a


def test_chunk_documents(spark, documents):
    """Sliding windows: correct starts/overlap, short tail kept, empty
    docs skipped, reconstruction of the token stream from step-strided
    chunks."""
    import pytest as _pytest

    from miru_spark.operators.chunking import chunk_documents

    tiny = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    got = (
        chunk_documents(tiny, size=4, overlap=1)
        .toPandas()
        .sort_values(["id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = got[got["id"] == 1]
    assert list(d1["start"]) == [0, 3, 6, 9]  # step = size - overlap = 3
    assert list(d1["n_tokens"]) == [4, 4, 4, 1]  # short tail kept
    assert d1.iloc[0]["chunk_text"] == "w0 w1 w2 w3"
    assert d1.iloc[1]["chunk_text"].startswith("w3")  # overlap of 1
    assert list(got[got["id"] == 2]["chunk_text"]) == ["a b"]
    assert (got["id"] != 3).all()  # empty doc yields no chunks

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(tiny, size=4, overlap=4)

    # corpus-level invariant: strided concat of non-overlap prefixes
    # reconstructs every doc's token count
    full = chunk_documents(documents, size=32, overlap=8).toPandas()
    per_doc = full.groupby("id").apply(
        lambda g: sum(min(24, n) if i < len(g) - 1 else n
                      for i, n in enumerate(g.sort_values("chunk_idx")["n_tokens"]))
        , include_groups=False)
    from miru_spark.operators.textstats import token_counts
    tc = token_counts(documents).toPandas().set_index("id")["n_tokens"]
    for did, total in per_doc.items():
        assert total == tc[did], did


def test_tfidf_keywords(spark):
    """tf·idf keyword extraction: a doc's unique heavy term outranks a
    term shared across docs; rank is dense 1..k per doc."""
    import math

    from miru_spark.operators.textstats import tfidf_keywords

    tiny = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    got = tfidf_keywords(tiny, k=2).toPandas()
    assert list(got.columns) == ["id", "term", "tfidf", "kw_rank"]
    top1 = got[(got["id"] == 1) & (got["kw_rank"] == 1)].iloc[0]
    # N=3: apple tf=2 df=1 -> 2·ln(3); banana tf=1 df=2 -> ln(1.5)
    assert top1["term"] == "apple"
    assert abs(top1["tfidf"] - round(2 * math.log(3.0), 4)) < 1e-9
    assert (got.groupby("id")["kw_rank"].max() <= 2).all()
    assert (got.groupby("id")["kw_rank"].min() == 1).all()


def test_unigram_logprob(spark):
    """Unigram-LM perplexity proxy: hand-checked averages; empty docs
    answer with n_tokens=0 / logprob 0."""
    import math

    from miru_spark.operators.textstats import unigram_logprob

    tiny = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc"), (3, "")],
        "doc_id long, text string",
    )
    got = unigram_logprob(tiny).toPandas().set_index("id").sort_index()
    # corpus: aa:2 bb:2 cc:1, T=5
    assert got.loc[1, "n_tokens"] == 3
    assert abs(got.loc[1, "avg_logprob"] - round(math.log(2 / 5), 4)) < 1e-9
    exp2 = round((math.log(2 / 5) + math.log(1 / 5)) / 2, 4)
    assert abs(got.loc[2, "avg_logprob"] - exp2) < 1e-9
    assert got.loc[3, "n_tokens"] == 0 and got.loc[3, "avg_logprob"] == 0.0


def test_pmi_collocations(spark):
    """Adjacent-bigram PMI: two always-together pairs tie at ln(8) and
    order by gram ascending; sub-threshold bigrams are dropped."""
    import math

    from miru_spark.operators.textstats import pmi_collocations

    rows = [(i, "new york") for i in range(5)]
    rows += [(10 + i, "big apple") for i in range(5)]
    rows.append((99, "york big"))  # one-off bigram, below min_count
    tiny = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_collocations(tiny, min_count=5, top_n=10).toPandas()
    assert list(got["gram"]) == ["big apple", "new york"]
    # B=11 bigrams total, T=22 tokens; c_ab=5, c_a=c_b=6 for york/big?
    # no: new=5, york=6, big=6, apple=5 -> pmi(new york)=ln((5/11)/((5/22)*(6/22)))
    exp_ny = round(math.log((5 / 11) / ((5 / 22) * (6 / 22))), 4)
    exp_ba = round(math.log((5 / 11) / ((6 / 22) * (5 / 22))), 4)
    assert abs(got.loc[got["gram"] == "new york", "pmi"].iloc[0] - exp_ny) < 1e-9
    assert abs(got.loc[got["gram"] == "big apple", "pmi"].iloc[0] - exp_ba) < 1e-9
    assert (got["n"] == 5).all()


def test_cluster_embeddings(spark):
    """Spherical k-means: two well-separated blobs split into exactly
    two clusters, assignment is a total partition, repeat runs agree."""
    import numpy as np

    from miru_spark.operators.similarity import cluster_embeddings

    rng = np.random.default_rng(7)
    a = rng.normal(loc=(5, 0, 0, 0), scale=0.05, size=(40, 4))
    b = rng.normal(loc=(0, 5, 0, 0), scale=0.05, size=(40, 4))
    rows = [(i, v.tolist()) for i, v in enumerate(np.vstack([a, b]))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = (
        cluster_embeddings(emb, n_clusters=2, sample=80, iters=10, seed=3)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == 80 and got["vec_id"].is_unique
    assert set(got["cluster"]) == {0, 1}
    # each blob is pure: all of a in one cluster, all of b in the other
    ca = set(got.loc[got["vec_id"] < 40, "cluster"])
    cb = set(got.loc[got["vec_id"] >= 40, "cluster"])
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    assert (got["sim"] > 0.99).all()  # tight blobs hug their centroid
    again = (
        cluster_embeddings(emb, n_clusters=2, sample=80, iters=10, seed=3)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (again["cluster"] == got["cluster"]).all()


def test_survivor_docs(spark):
    """Quality-aware survivor: the highest-quality member of each
    component wins; ties break to the lowest id."""
    from miru_spark.operators.components import survivor_docs

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (10, 0.4), (11, 0.4)],
        "id long, quality double",
    )
    got = (
        survivor_docs(edges, quality)
        .toPandas()
        .set_index("doc_id")["survivor_id"]
        .sort_index()
    )
    assert got.loc[1] == got.loc[2] == got.loc[3] == 2  # best quality
    assert got.loc[10] == got.loc[11] == 10  # tie -> lowest id


def test_vocab_coverage(spark):
    """Vocabulary curve: rank by cf desc / term asc, coverage is the
    cumulative token fraction and reaches 1.0 at full vocabulary."""
    from miru_spark.operators.textstats import vocab_coverage

    tiny = spark.createDataFrame(
        [(1, "aa aa aa bb"), (2, "bb cc aa"), (3, "cc")],
        "doc_id long, text string",
    )
    # corpus: aa:4(df2) bb:2(df2) cc:2(df2), T=8
    got = vocab_coverage(tiny, top_v=10).toPandas()
    assert list(got.columns) == ["rank", "term", "cf", "df", "coverage"]
    assert list(got["term"]) == ["aa", "bb", "cc"]  # cf desc, term asc tie
    assert list(got["cf"]) == [4, 2, 2]
    assert list(got["df"]) == [2, 2, 2]
    assert list(got["coverage"]) == [0.5, 0.75, 1.0]
    # truncated vocabulary keeps the prefix of the same curve
    top2 = vocab_coverage(tiny, top_v=2).toPandas()
    assert list(top2["term"]) == ["aa", "bb"]
    assert list(top2["coverage"]) == [0.5, 0.75]


def test_oov_rate(spark):
    """OOV fraction against the top-V corpus vocabulary; empty docs
    answer with rate 0."""
    from miru_spark.operators.textstats import oov_rate

    tiny = spark.createDataFrame(
        [(1, "aa aa aa bb"), (2, "bb cc aa"), (3, "cc"), (4, "")],
        "doc_id long, text string",
    )
    # top_v=1 vocabulary = {aa}; doc1: 1/4 OOV, doc2: 2/3, doc3: 1/1
    got = oov_rate(tiny, top_v=1).toPandas().set_index("id").sort_index()
    assert got.loc[1, "n_tokens"] == 4 and got.loc[1, "n_oov"] == 1
    assert got.loc[1, "oov_rate"] == 0.25
    assert got.loc[2, "n_oov"] == 2 and abs(got.loc[2, "oov_rate"] - 0.666667) < 1e-6
    assert got.loc[3, "oov_rate"] == 1.0
    assert got.loc[4, "n_tokens"] == 0 and got.loc[4, "oov_rate"] == 0.0


def test_length_histogram(spark):
    """Power-of-two length buckets: integer bucket math, inclusive
    [lo, hi] edges, zero-token docs in bucket -1."""
    from miru_spark.operators.textstats import length_histogram

    tiny = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d"), (5, "")],
        "doc_id long, text string",
    )
    got = length_histogram(tiny).toPandas().set_index("bucket")
    assert list(got.index) == [-1, 0, 1, 2]
    assert got.loc[-1, "n_docs"] == 1 and got.loc[-1, "n_tokens"] == 0
    assert got.loc[0, "lo"] == 1 and got.loc[0, "hi"] == 1
    assert got.loc[1, "lo"] == 2 and got.loc[1, "hi"] == 3
    assert got.loc[1, "n_docs"] == 2 and got.loc[1, "n_tokens"] == 5
    assert got.loc[2, "lo"] == 4 and got.loc[2, "hi"] == 7
    assert got.loc[2, "n_docs"] == 1


def test_funnel_strict_ordering(spark):
    """A click BEFORE the user's first view must not convert; stages
    only count users who completed the previous stage earlier in time."""
    from datetime import datetime

    from miru_spark.driver_queries import QUERIES  # uses the same logic

    rows = [
        # u1: full ordered funnel
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:01:00", 1, "click"),
        (3, "2024-01-01 00:02:00", 1, "purchase"),
        # u2: click precedes the first view -> stalls at view
        (4, "2024-01-01 00:00:30", 2, "click"),
        (5, "2024-01-01 00:01:30", 2, "view"),
        # u3: view + purchase but no click -> stalls at view
        (6, "2024-01-01 00:00:10", 3, "view"),
        (7, "2024-01-01 00:03:00", 3, "purchase"),
    ]
    import tempfile

    ev = spark.createDataFrame(
        [
            (i, datetime.fromisoformat(ts), u, k, 0.0, "{}")
            for i, ts, u, k in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp(prefix="miru_funnel_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = (
        QUERIES["funnel_events"](spark, d)
        .toPandas()
        .set_index("event")["n_users"]
    )
    assert got["view"] == 3 and got["click"] == 1 and got["purchase"] == 1


def test_retention_cohorts(spark):
    """Cohort = first-activity week; offsets count returning users only
    in weeks they were actually active."""
    import tempfile
    from datetime import datetime

    from miru_spark.driver_queries import QUERIES

    rows = [
        (1, "2024-01-02", 1), (2, "2024-01-10", 1), (3, "2024-01-16", 1),
        (4, "2024-01-03", 2),
        (5, "2024-01-09", 3), (6, "2024-01-17", 3),
    ]
    ev = spark.createDataFrame(
        [
            (i, datetime.fromisoformat(d), u, "view", 0.0, "{}")
            for i, d, u in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp(prefix="miru_ret_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = QUERIES["retention_cohorts"](spark, d).toPandas()
    by = {(r.cohort_week, r.week_offset): r.n_users for r in got.itertuples()}
    # week 0 cohort: u1, u2 -> u1 returns at offsets 1 and 2
    assert by[(0, 0)] == 2 and by[(0, 1)] == 1 and by[(0, 2)] == 1
    # week 1 cohort: u3 -> returns at offset 1
    assert by[(1, 0)] == 1 and by[(1, 1)] == 1
    assert len(by) == 5


def test_strut_unit_weighted_ignores_scalar(spark, tiny_turns):
    """strategy='unit_weighted' must ignore a 'scalar' column riding on
    a shared model DataFrame — the scalar multiplier belongs to
    regression_weighted/max only (Strut.java:368-400)."""
    import pyspark.sql.functions as F

    from miru_spark.index import InvertedIndex
    from miru_spark.operators.strut import strut_score

    idx = InvertedIndex.build(tiny_turns)
    cands = idx.docs.select("docint").limit(200)
    model = spark.createDataFrame(
        [("w00001", 1.0), ("w00002", 0.5), ("w00007", 0.25)],
        "term string, weight double",
    )
    plain = strut_score(idx, cands, model, k=10, strategy="unit_weighted")
    with_scalar = strut_score(
        idx,
        cands,
        model.withColumn("scalar", F.lit(7.0)),
        k=10,
        strategy="unit_weighted",
    )
    assert [tuple(r) for r in plain.collect()] == [
        tuple(r) for r in with_scalar.collect()
    ]
