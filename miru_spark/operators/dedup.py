"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All shapes are the standard large-corpus dedup pipeline expressed as
DataFrame jobs. Scale notes per operator:

- **exact**: one groupBy on a 60-bit fingerprint — the shuffle key is
  uniform by construction (hash), no skew.
- **n-gram Jaccard**: candidate pairs via a shared-shingle equi-join
  (only docs sharing ≥1 shingle meet), then exact Jaccard verify. At
  100 TB you bound the join by dropping ultra-common shingles (df cap),
  same as heavy-term salting; the `max_df` knob does that here.
- **MinHash + LSH**: signatures = min over shingles of H seeded hashes
  (one groupBy); banding joins docs only within equal band buckets —
  the classic sub-quadratic near-dup path. Candidates are verified with
  exact Jaccard so the operator's output is deterministic given the
  hash family (md5 — oracle-reproducible).
- **SimHash**: 32-bit signature via per-bit weighted majority over
  token hashes; Hamming-close pairs are near-dups. Computed with a
  vectorized pandas UDF (popcount tricks), oracle-checked against a
  pure-SQL bit-explode formulation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.operators.hashing import md5_long, norm_text
from miru_spark.tokenize import tokens_col


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp) — 60-bit content fingerprint over normalized text."""
    return docs.select(
        F.col(id_col), md5_long(norm_text(F.col(text_col))).alias("fp")
    )


def exact_dup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per fingerprint: group size + the doc to keep (min id)."""
    return (
        fingerprint(docs, id_col, text_col)
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def shingles(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """(id, shingle) — distinct token k-grams per doc.

    Built as posexplode + ``lead`` over a per-doc window (same shape as
    textstats ``_doc_ngrams``): the window is partitioned by the
    high-cardinality doc id, so it stays in whole-stage codegen. The
    previous ``transform(sequence(…), i -> array_join(slice(…)))``
    higher-order-function build ran interpreted and measured ~10×
    slower on the same gram volume (BENCH/BASELINE.md microbench).

    ``hashed=True`` replaces the ~25-35 byte gram string with its
    60-bit md5 (``md5_long`` — same hash family as the DuckDB twins)
    BEFORE the distinct, so every downstream shuffle (distinct, df
    count, pair join) moves 8-byte longs instead of strings — ~3×
    less shuffle volume and long-key comparisons. Set semantics are
    preserved up to md5 collisions: at 1e12 distinct shingles (a
    ~10B-doc corpus) ~4e5 of the ~5e23 type pairs collide, and a
    collision only perturbs a pair's Jaccard by ±1 shared gram —
    far below any duplicate threshold's decision margin.
    """
    occ = _span_occurrences(docs, k, id_col, text_col)
    gram = md5_long(F.col("gram")) if hashed else F.col("gram")
    return occ.select("id", gram.alias("shingle")).distinct()



# Corpus-size floor for forcing shuffled-hash pair joins: below it the
# join sides broadcast for free and a strategy hint would only ADD
# exchanges (measured +31-37% on the sf0.1 bench rows when hinted
# unconditionally); above it sort-merge's sort of the ballooned sides
# was the 1M-doc soak's only spilling stage (0 bytes with SHJ).
PAIR_SHJ_MIN_DOCS = 100_000


def _shj(side: DataFrame, n_docs: int) -> DataFrame:
    """Hint the hash-build side of a pair join iff the corpus is big
    enough that broadcast is off the table anyway."""
    return side.hint("shuffle_hash") if n_docs >= PAIR_SHJ_MIN_DOCS else side


def _finalize_pairs(result: DataFrame, cached: list) -> DataFrame:
    """Materialize a (small) pair result via eager localCheckpoint and
    release the per-call cached intermediates. Pair relations are tiny
    next to the shingle/signature relations that produce them; without
    this, repeated invocations (the per-batch delta API, pipeline runs)
    accumulate cached intermediates until Spark's LRU storage eviction
    thrashes (round-3 review finding)."""
    out = result.localCheckpoint(eager=True)
    for c in cached:
        try:
            c.unpersist()
        except Exception:
            pass
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | str | None = "auto",
    n_docs: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with Jaccard(k-shingles) ≥ t.

    ``max_df`` drops shingles shared by more than that many docs before
    the pair join — the stop-shingle cap that keeps the join
    sub-quadratic on skewed corpora (one viral boilerplate shingle with
    df=d otherwise contributes d² candidate rows). ON BY DEFAULT:
    ``"auto"`` = max(64, 0.5% of the corpus), so no real near-dup pair
    (which shares many RARE shingles) is affected, while a hot shingle
    can never quadratic-blow the join. Verification Jaccard still uses
    the full shingle sets, so scores are exact for surviving pairs; the
    only pairs a cap can lose are docs whose ONLY shared shingles are
    all viral — by construction low-Jaccard unless the docs are shorter
    than k+cap tokens. ``None`` disables the cap (oracle twin).
    """
    cached: list = []
    sh = shingles(docs, k, id_col, text_col, hashed=True).cache()
    cached.append(sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if n_docs is None:
        n_docs = docs.count()
    if max_df == "auto":
        max_df = max(64, -(-n_docs // 200))
    join_sh, capped_sh = _df_cap_split(sh, max_df, cached)
    a, b = join_sh.alias("a"), join_sh.alias("b")
    # Fused verify: the pair join already touches every shared uncapped
    # shingle once, so groupBy-count IS the shared-shingle count — no
    # distinct() + re-join of the full shingle sets per candidate (the
    # re-join shuffled Σ(n_a+n_b) gram rows per candidate and dominated
    # the 1M-doc soak; see BENCH/BASELINE.md round-3 section).
    # size-gated shuffle_hash (see _shj): at soak scale each side of
    # this self-join is a few MB per shuffle partition, so the hash
    # build is a small in-memory map — while sort-merge SORTS both
    # join-multiplicity-ballooned sides and was the single spilling
    # stage of the 1M-doc soak (16.6+9.9 GB at 64MB advisory
    # partitions; 0 bytes with SHJ — BENCH/BASELINE.md round-4).
    shared = (
        a.join(_shj(b, n_docs), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    shared = _add_capped_shared(shared, capped_sh, cached)
    return _finalize_pairs(
        _jaccard_from_counts(shared, sizes, threshold), cached
    )


def _df_cap_split(
    sh: DataFrame, max_df: int | None, cached: list | None = None
) -> tuple[DataFrame, DataFrame | None]:
    """Split the shingle relation on the stop-shingle df cap:
    (join-side shingles with df ≤ cap, capped shingles with df > cap —
    or None when the cap is off).

    Eagerly probes whether ANY shingle exceeds the cap (one aggregate
    over the cached shingle relation — the same df count the anti-join
    needs anyway). On realistic heavy-tail corpora no shingle comes
    near 0.5%·n document frequency, and the probe lets the whole cap
    machinery (anti-join, capped-side scan, correction join, persist)
    vanish from the plan instead of running as no-ops."""
    if max_df is None:
        return sh, None
    common = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("shingle")
        .cache()
    )
    if common.limit(1).count() == 0:
        common.unpersist()
        return sh, None
    if cached is not None:
        cached.append(common)
    return (
        sh.join(common, "shingle", "left_anti"),
        sh.join(common, "shingle", "left_semi"),
    )


def _add_capped_shared(
    shared: DataFrame, capped_sh: DataFrame | None, cached: list | None = None
) -> DataFrame:
    """Make the fused per-pair shared count exact under the df cap.

    ``shared`` counts shingles the pair join touched — i.e. shared
    shingles with df ≤ cap. A pair may additionally share capped (hot)
    shingles; those are counted by joining the candidate pairs against
    the capped shingle sets only (a few shingles per doc — tiny next to
    the full sets), so n_shared equals the full-set intersection and
    Jaccard values are exact, identical to the uncapped definition for
    every surviving pair."""
    if capped_sh is None:
        return shared
    # `shared` feeds two plan branches (the correction join and the
    # final count sum); persist so the big pair join runs once.
    shared = shared.persist()
    if cached is not None:
        cached.append(shared)
    s_cap = (
        shared.select("id_a", "id_b")
        .join(capped_sh.alias("ca"), F.col("id_a") == F.col("ca.id"))
        .join(
            capped_sh.alias("cb"),
            (F.col("id_b") == F.col("cb.id"))
            & (F.col("ca.shingle") == F.col("cb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_cap"))
    )
    return (
        shared.join(s_cap, ["id_a", "id_b"], "left")
        .withColumn(
            "n_shared",
            F.col("n_shared") + F.coalesce(F.col("n_cap"), F.lit(0)),
        )
        .drop("n_cap")
    )


def _jaccard_from_counts(
    shared: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """(id_a, id_b, n_shared) + per-doc set sizes → exact Jaccard ≥ t."""
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _jaccard_verify(
    sh: DataFrame, sizes: DataFrame, cand: DataFrame, threshold: float,
    n_docs: int = 0,
) -> DataFrame:
    """Exact Jaccard over full shingle sets for candidate (id_a, id_b)
    pairs — the verification stage for candidate generators whose join
    does not itself touch shingles (MinHash band buckets). The shingle-
    keyed generators use the fused count path instead (see
    ``ngram_jaccard_pairs``)."""
    shared = (
        # build on the candidate-pair side: pairs are tiny next to the
        # full shingle sets (size-gated — see _shj)
        _shj(cand, n_docs)
        .join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(
            sh.alias("sb"),
            (F.col("id_b") == F.col("sb.id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return _jaccard_from_counts(shared, sizes, threshold)


def ngram_jaccard_pairs_delta(
    docs: DataFrame,
    delta_ids: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | str | None = "auto",
) -> DataFrame:
    """Incremental near-dup detection: pairs with Jaccard ≥ t where AT
    LEAST ONE side is a newly-ingested doc (``delta_ids``, one ``id``
    column) — the maintenance query a continuously-fed corpus runs per
    batch instead of re-pairing everything.

    The candidate join is (delta shingles) ⋈ (corpus shingles): cost is
    proportional to the DELTA's shingle mass times per-shingle df, never
    to corpus², and the same stop-shingle df cap bounds hot shingles.
    New-new pairs are found too (both sides in the delta). Results equal
    ``ngram_jaccard_pairs(docs)`` filtered to pairs touching the delta.
    """
    cached: list = []
    sh = shingles(docs, k, id_col, text_col, hashed=True).cache()
    cached.append(sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_df == "auto":
        max_df = max(64, -(-docs.count() // 200))
    join_sh, capped_sh = _df_cap_split(sh, max_df, cached)
    # Flag delta membership so each pair's shared shingles are counted
    # exactly once (a delta-delta pair meets in both join orders):
    # keep (delta, non-delta) rows always, (delta, delta) only ordered.
    flagged = join_sh.join(
        delta_ids.select("id").withColumn("_delta", F.lit(True)),
        "id",
        "left",
    )
    new_sh = flagged.where(F.col("_delta")).alias("d")
    shared = (
        new_sh.join(flagged.alias("o"), "shingle")
        .where(
            F.col("o._delta").isNull() | (F.col("d.id") < F.col("o.id"))
        )
        .groupBy(
            F.least(F.col("d.id"), F.col("o.id")).alias("id_a"),
            F.greatest(F.col("d.id"), F.col("o.id")).alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    shared = _add_capped_shared(shared, capped_sh, cached)
    return _finalize_pairs(
        _jaccard_from_counts(shared, sizes, threshold), cached
    )


def minhash_signatures(
    docs: DataFrame | None = None,
    n_hashes: int = 8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sh: DataFrame | None = None,
) -> DataFrame:
    """(id, seed, minhash) — H seeded min-hashes over k-shingles.

    Pass a precomputed (cached) ``sh`` relation to share one shingle
    scan between the signature and verification paths."""
    if sh is None:
        sh = shingles(docs, k, id_col, text_col)
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(n_hashes)])
    ).alias("seed")
    return (
        sh.select("id", "shingle", seeds)
        .withColumn(
            "h",
            md5_long(F.concat(F.col("shingle"), F.lit("#"), F.col("seed"))),
        )
        .groupBy("id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """LSH-banded candidate pairs, verified with exact Jaccard ≥ t.

    bands = H / band_size; a pair is a candidate iff it collides in at
    least one band (equal minhashes across the band's rows).
    """
    # ONE cached shingle scan feeds both the signature path and the
    # exact-Jaccard verify path (previously computed twice)
    sh = shingles(docs, k, id_col, text_col).cache()
    sig = minhash_signatures(n_hashes=n_hashes, sh=sh)
    bands = (
        sig.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("id", "band")
        .agg(
            # band key = minhashes in seed order (deterministic tuple)
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(seed, minhash))), "
                "x -> cast(x.minhash as string)), ',')"
            ).alias("band_key")
        )
    )
    if n_docs is None:
        n_docs = docs.count()
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            # band buckets are per-partition small at soak scale — hash
            # build beats sorting the bucket-ballooned sides
            # (size-gated, see _shj)
            _shj(b, n_docs),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify with exact Jaccard over the SAME cached shingle sets
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    return _finalize_pairs(
        _jaccard_verify(sh, sizes, cand, threshold, n_docs=n_docs), [sh]
    )


SIMHASH_BITS = 32


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over unique tokens (tf-weighted).

    Vectorized pandas UDF: per Arrow batch, token hashes come from a
    md5 dict cache (vocabulary-sized), bit contributions via numpy
    unpacking — no per-bit Python. Oracle-checked against the SQL
    bit-explode formulation (same md5 hash family).
    """
    import hashlib

    from miru_spark.tokenize import _PY_TOKEN

    def sim_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def h(tok: str) -> int:
            v = cache.get(tok)
            if v is None:
                v = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                cache[tok] = v
            return v

        bit_id = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            # docs with zero tokenizable tokens have NO signature (the
            # shingle ops and the DuckDB twin both skip them); emitting
            # 0 would make all such docs pairwise hamming-0 "duplicates"
            # and funnel them into one quadratic band bucket
            keep = np.ones(len(pdf), dtype=bool)
            for i, text in enumerate(pdf["text"]):
                toks = _PY_TOKEN.findall((text or "").lower())
                if not toks:
                    keep[i] = False
                    continue
                vals, counts = np.unique(
                    np.array([h(t) for t in toks], dtype=np.uint64),
                    return_counts=True,
                )
                bits = (vals[:, None] >> bit_id) & np.uint64(1)  # (n,32)
                votes = (counts[:, None] * np.where(bits == 1, 1, -1)).sum(axis=0)
                out[i] = int(((votes > 0).astype(np.uint64) << bit_id).sum())
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy()[keep], "simhash": out[keep]}
            )

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(sim_batches, schema="id long, simhash long")


def simhash_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within Hamming distance ``max_hamming``
    of their 32-bit SimHashes.

    Candidate generation is the classic band trick with a PIGEONHOLE
    GUARANTEE (not probabilistic): split the signature into ``n_bands``
    contiguous bit bands; any pair with ≤ ``max_hamming`` < n_bands
    differing bits must agree exactly on ≥1 band, so an equi-join on
    (band, band_bits) finds every qualifying pair. Verification is an
    exact popcount over the candidates only. Sub-quadratic as long as
    band values spread (16 bits/band at the defaults); raise n_bands
    for larger d at the cost of coarser bands.
    """
    if max_hamming >= n_bands:
        raise ValueError("pigeonhole needs max_hamming < n_bands")
    if SIMHASH_BITS % n_bands:
        raise ValueError("n_bands must divide SIMHASH_BITS")
    bits = SIMHASH_BITS // n_bands
    mask = (1 << bits) - 1
    sig = simhash(docs, id_col, text_col).cache()
    bands = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright("simhash", b * bits).bitwiseAND(mask)
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_bk"),
    ).select("id", "simhash", "_bk.band", "_bk.key")
    if n_docs is None:
        n_docs = docs.count()
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            _shj(b, n_docs),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key")),
        )
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    return _finalize_pairs(
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"),
        [sig],
    )


# ---------------------------------------------------------------------------
# exact-substring (duplicated k-token span) dedup — Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better". The paper
# builds a suffix array; the set-semantics equivalent over FIXED-width
# windows is pure relational algebra and shuffles on uniform keys.
# ---------------------------------------------------------------------------


def _span_occurrences(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gram): every k-token window of every doc WITH its
    position (unlike :func:`shingles`, occurrences are not deduped —
    positions drive span removal).

    posexplode + ``lead`` over a per-doc window: codegen'd, no
    interpreted higher-order functions (see :func:`shingles`). A gram
    exists at ``pos`` iff token ``pos + k - 1`` exists, so filtering on
    the LAST lead being non-null both drops short tails and guarantees
    every intermediate lead is populated.
    """
    from pyspark.sql import Window

    ex = docs.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("t")
    ).select("id", F.posexplode("t").alias("pos", "w"))
    win = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(win) for i in range(1, k)]
    last = F.lead("w", k - 1).over(win)
    return (
        ex.select(
            "id", "pos", F.concat_ws(" ", *parts).alias("gram"), last.alias("_ok")
        )
        .where(F.col("_ok").isNotNull())
        .drop("_ok")
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Every k-token span occurring more than once corpus-wide:
    (gram, n_occ, n_docs).

    One shuffle keyed on the gram text; map-side partial aggregation
    bounds shuffle rows by distinct-gram count per task, so a viral
    boilerplate span (the skew case) combines before the exchange. At
    production scale group on ``xxhash64(gram)`` instead of the text to
    shrink the shuffle payload — the text key is kept here so the DuckDB
    oracle matches byte-for-byte.
    """
    return (
        _span_occurrences(docs, k, id_col, text_col)
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.count_distinct("id").alias("n_docs"),
        )
        .where(F.col("n_occ") > 1)
    )


def strip_duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every token covered by a duplicated k-token span, except in
    the span's FIRST corpus occurrence (min (doc_id, pos)) — the
    exact-substring dedup rewrite (Lee et al. '21 drop-all-but-first,
    over fixed k windows instead of a suffix array).

    Returns (doc_id, n_tokens, n_removed, clean_text) for every input
    doc: ``clean_text`` = surviving tokens joined by single spaces in
    original order (analyzed form — lowercased, punctuation collapsed).

    Scale shape: tokenize scan → one groupBy(gram) (uniform text keys,
    partial-agg combines hot grams) → occurrence equi-join back on gram
    → position explode bounded by k × duplicated-occurrence count → one
    left_anti on (id, pos) → one groupBy(id) rebuild. No window over
    anything bigger than a doc, no driver loop, no crossJoin.
    """
    occ = _span_occurrences(docs, k, id_col, text_col).cache()
    keepers = (
        occ.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            # lexicographic struct min == first corpus occurrence
            F.min(F.struct("id", "pos")).alias("_keep"),
        )
        .where(F.col("n_occ") > 1)
        .select("gram", "_keep")
    )
    dup_occ = (
        occ.join(keepers, "gram")
        .where(
            (F.col("id") != F.col("_keep.id"))
            | (F.col("pos") != F.col("_keep.pos"))
        )
        .select("id", "pos")
    )
    covered = dup_occ.select(
        "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tpos")
    ).distinct()

    tokrows = docs.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("tokens")
    ).select("id", F.size("tokens").alias("n_tokens"), F.posexplode("tokens").alias("tpos", "tok"))
    kept = tokrows.join(covered, ["id", "tpos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    base = docs.select(
        F.col(id_col).alias("id"), F.size(tokens_col(text_col)).alias("n_tokens")
    )
    return (
        base.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
