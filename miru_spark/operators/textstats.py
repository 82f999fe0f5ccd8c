"""Text analysis operators: token counts, quality scoring, language ID,
document fingerprints. All formulas are engine-portable (the DuckDB
oracle reproduces them exactly) and JVM-side (no Python in the path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.operators.hashing import norm_text
from miru_spark.tokenize import tokens_col

# deterministic marker lists for the n-gram/stopword language heuristic;
# ties break by language name ascending
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist", "nicht", "das", "mit", "ein"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "que", "de", "los", "es", "una", "por"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
}

STOPWORDS = LANG_MARKERS["en"]


def _word_hits(low, words: list[str]):
    """Count occurrences of any of ``words`` as WHOLE tokens of the
    lowercased text — lookarounds bound the match to a maximal
    [a-z0-9']+ run, so the count equals filtering the token array."""
    pat = "(?<![a-z0-9'])(?:" + "|".join(words) + ")(?![a-z0-9'])"
    return F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0)))


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, n_unique_tokens, n_chars_norm)."""
    toks = tokens_col(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(norm_text(F.col(text_col))).alias("n_chars_norm"),
    )


def quality_feature_cols(low=None, toks=None, text_col: str = "text") -> dict:
    """The per-row quality feature expressions, keyed by output name.

    ``low``/``toks`` are the pre-materialized lowercased-text and
    token-array columns (pass them when the caller already staged a
    one-tokenize struct — the analyze_locale trick); defaults derive
    both from ``text_col``. Exposed so the pipeline's quality gate can
    apply the EXACT same arithmetic inline on the doc relation (a pure
    per-row filter, no join) — see pipeline.prepare_training_data.
    """
    if low is None:
        low = F.lower(F.col(text_col))
    if toks is None:
        toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_stop = _word_hits(low, STOPWORDS)
    # alnum char count via translate-delete, NOT regexp_replace of the
    # complement class: identical value (len - count of chars in the
    # set), but the regex replace allocates per match and measured 31s
    # vs 0.3s on a 250k-doc scan (BENCH/BASELINE.md)
    _alnum_chars = "abcdefghijklmnopqrstuvwxyz0123456789' "
    n_alnum = F.length(low) - F.length(F.translate(low, _alnum_chars, ""))
    ttr = F.round(F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)), 4)
    stop_ratio = F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4)
    alnum_ratio = F.round(n_alnum / F.greatest(F.length(low), F.lit(1)), 4)
    return {
        "n_tokens": n_tok,
        "ttr": ttr,
        "stop_ratio": stop_ratio,
        "alnum_ratio": alnum_ratio,
        "avg_token_len": F.round(
            F.length(F.array_join(toks, "")) / F.greatest(n_tok, F.lit(1)), 4
        ),
        "quality": F.round(
            (ttr + F.least(stop_ratio * 4, F.lit(1.0)) + alnum_ratio) / 3.0, 4
        ),
    }


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features + a composite score in [0,1]:

    - ``ttr`` type-token ratio (lexical diversity)
    - ``stop_ratio`` fraction of tokens in the stopword list (natural
      text has some; keyword soup has none)
    - ``alnum_ratio`` fraction of characters that are [a-z0-9' ]
    - ``avg_token_len``
    - ``quality``: mean of (ttr, min(stop_ratio*4, 1), alnum_ratio)
    """
    # one tokenize, struct-materialized (the analyze_locale trick); the
    # stopword count is a lookaround-regex extract over the lowercased
    # text — COUNT-IDENTICAL to filtering the token array (a token is a
    # maximal [a-z0-9']+ run, so "s with no [a-z0-9'] on either side" is
    # exactly "token == s") but whole-stage-codegen instead of the
    # interpreted F.filter HOF, which measured ~6x slower at 250k docs
    # (BENCH/pipeline_soak section in BENCH/BASELINE.md)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.lower(F.col(text_col)).alias("_low"),
        F.struct(tokens_col(text_col).alias("t")).alias("_s"),
    )
    feats = quality_feature_cols(low=F.col("_low"), toks=F.col("_s.t"))
    return base.select(
        "id", *[expr.alias(name) for name, expr in feats.items()]
    )


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, lang_pred, lang_score) — argmax of marker-token hit rate.

    Deterministic: ties break by language code ascending; docs with no
    marker hits get 'und' (undetermined).
    """
    low = F.lower(F.col(text_col))
    n_tok = F.size(tokens_col(text_col))
    cols = []
    for lang in sorted(LANG_MARKERS):
        # codegen-friendly whole-token regex count (== token-array
        # filter; see _word_hits)
        hits = _word_hits(low, LANG_MARKERS[lang])
        cols.append(
            F.struct(
                F.round(hits / F.greatest(n_tok, F.lit(1)), 4).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max picks highest score; struct comparison breaks score ties
    # by the SECOND field descending... we need ascending lang on ties,
    # so compare (score, reversed-rank) — encode rank as negative index.
    ranked = []
    for i, c in enumerate(cols):
        ranked.append(
            F.struct(
                c["score"].alias("score"),
                F.lit(-i).alias("rk"),
                c["lang"].alias("lang"),
            )
        )
    best = F.array_max(F.array(*ranked))
    return docs.select(
        F.col(id_col).alias("id"),
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def doc_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fp_md5, fp_long) — full md5 hex + 60-bit prefix int."""
    from miru_spark.operators.hashing import md5_long

    norm = norm_text(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(norm).alias("fp_md5"),
        md5_long(norm).alias("fp_long"),
    )


def gram_stats_udf(n: int):
    """Arrow-batched pandas UDF: ``tokens array<string> -> struct<
    n_ngrams int, n_distinct int>`` — per-doc total and distinct token
    ``n``-gram counts, computed entirely within the row's own tokens.

    This is the scale-correct plan for PER-DOC gram statistics: the
    distributed path (posexplode -> window -> groupBy(id, gram) ->
    groupBy(id)) shuffles the whole exploded token stream ~3x to
    compute a number that never leaves its row. Per batch it is exact
    (no hashing): tokens are integer-coded with one ``pd.factorize``
    over the batch's flat token stream, gram rows are (doc, c0..cn-1)
    int64 tuples, and distinct counts come from ``np.unique`` over a
    void view of the contiguous tuple matrix — injective, so
    collision-free, unlike the xxhash64 path the corpus-df variant
    uses. Measured at 1M docs (BENCH/BASELINE.md): the quality gate
    drops from 207 s (shuffled) to seconds.
    """

    @F.pandas_udf("struct<n_ngrams:int,n_distinct:int>")
    def stats(tok: pd.Series) -> pd.DataFrame:
        vals = [v if v is not None else [] for v in tok]
        counts = np.fromiter((len(v) for v in vals), np.int64, len(vals))
        total = np.maximum(counts - (n - 1), 0)
        out = pd.DataFrame(
            {
                "n_ngrams": total.astype(np.int32),
                "n_distinct": np.zeros(len(vals), dtype=np.int32),
            }
        )
        n_grams = int(total.sum())
        if n_grams == 0:
            return out
        flat = np.concatenate([np.asarray(v, dtype=object) for v in vals])
        codes, _ = pd.factorize(flat)
        offs = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        # flat index of each gram's first token: doc start + local pos
        gram_offs = np.concatenate(([0], np.cumsum(total)[:-1]))
        local_j = np.arange(n_grams, dtype=np.int64) - np.repeat(
            gram_offs, total
        )
        starts = np.repeat(offs[:-1], total) + local_j
        mat = np.empty((n_grams, n + 1), dtype=np.int64)
        mat[:, 0] = np.repeat(np.arange(len(vals)), total)
        for i in range(n):
            mat[:, i + 1] = codes[starts + i]
        void = np.ascontiguousarray(mat).view(
            np.dtype((np.void, mat.dtype.itemsize * (n + 1)))
        )
        uniq = np.unique(void)
        urows = uniq.view(np.int64).reshape(-1, n + 1)[:, 0]
        out["n_distinct"] = np.bincount(
            urows, minlength=len(vals)
        ).astype(np.int32)
        return out

    return stats


def quality_gate(
    docs: DataFrame,
    quality_min: float = 0.3,
    rep_max: float = 0.5,
    rep_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The training pipeline's stage-1 gate as ONE narrow per-row
    filter over the corpus scan — no shuffle, no join: drop docs whose
    composite quality (``quality_feature_cols``, inline codegen'd
    expressions) is below ``quality_min`` or whose duplicate-``rep_n``-
    gram repetition ratio (``gram_stats_udf``, Arrow-batched per-row
    counts, ratio + rounding JVM-side) exceeds ``rep_max``. Catalyst
    pushes the deterministic quality predicate below the Arrow UDF, so
    the Python stage only sees quality survivors. Returns ``docs``'s
    own columns, untouched.

    Every gate signal is a function of the row's own text; the prior
    shape (score relations + two left_semi joins back) shuffled the
    exploded token stream 3x plus the doc relation 2x — 207 s of the
    348 s 1M-doc soak — for numbers that never needed to leave their
    row (BENCH/BASELINE.md).
    """
    toks = F.struct(tokens_col(text_col).alias("t"))
    staged = docs.select(
        "*",
        F.lower(F.col(text_col)).alias("_low"),
        toks.alias("_s"),
        gram_stats_udf(rep_n)(toks["t"]).alias("_g"),
    )
    q = quality_feature_cols(low=F.col("_low"), toks=F.col("_s.t"))["quality"]
    rep = F.when(
        F.col("_g.n_ngrams") > 0,
        F.round(
            1.0 - F.col("_g.n_distinct") / F.col("_g.n_ngrams").cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return staged.where(
        (q >= F.lit(quality_min)) & (rep <= F.lit(rep_max))
    ).select(*docs.columns)


def _doc_ngrams(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, gram) occurrence stream of token ``n``-grams.

    Window-lead construction partitioned by the high-cardinality doc id
    (see ngram_repetition's docstring for why not a higher-order
    transform lambda): scale-safe, stays in whole-stage codegen.
    """
    from pyspark.sql import Window

    toks = tokens_col(text_col)
    ex = docs.select(F.col(id_col).alias("id"), toks.alias("t")).select(
        "id", F.posexplode("t").alias("pos", "w")
    )
    win = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(win) for i in range(1, n)]
    last = F.lead("w", n - 1).over(win)
    return (
        ex.select("id", F.concat_ws(" ", *parts).alias("gram"), last.alias("_ok"))
        .where(F.col("_ok").isNotNull())
        .drop("_ok")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Dolma n-gram filter): flag
    every training doc that shares at least one token ``n``-gram with a
    held-out eval/benchmark set. Per doc:

    - ``n_grams`` — distinct n-grams in the doc,
    - ``n_hit`` — of those, how many appear anywhere in ``bench``,
    - ``contam_frac`` — ``n_hit / n_grams``,
    - ``contaminated`` — ``n_hit > 0``.

    Scale shape: eval sets are tiny relative to a 100 TB training
    corpus, so the distinct benchmark gram set is broadcast
    (``broadcast_bench=True``, default) and the check is one
    broadcast-hash left join over the training gram stream — a single
    scan of the corpus, no shuffle on the big side. Set
    ``broadcast_bench=False`` for a benchmark too large to broadcast
    (falls back to a shuffled join on the uniform gram hash key).
    Docs shorter than ``n`` tokens have zero grams and are kept
    (uncontaminated by construction).
    """
    bench_grams = _doc_ngrams(bench, n, id_col, text_col).select(
        "gram"
    ).distinct()
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    per = (
        _doc_ngrams(docs, n, id_col, text_col)
        .distinct()
        .join(bench_grams.withColumn("_hit", F.lit(1)), "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).cast("int").alias("n_hit"),
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_hit") / F.col("n_grams").cast("double"), 4),
            )
            .otherwise(0.0)
            .alias("contam_frac"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The diagnostics twin of :func:`decontaminate`, aggregated per
    BENCHMARK doc: for each eval doc,

    - ``n_grams`` — its distinct token n-grams,
    - ``n_leaked`` — of those, how many appear in ANY training doc,
    - ``n_train_docs`` — distinct training docs sharing ≥1 gram,
    - ``leak_frac`` — ``n_leaked / n_grams``.

    Answers "which eval items are compromised and how badly" — the
    report a team reads before trusting a benchmark score. Same scale
    shape as decontaminate: the (small) benchmark gram set broadcasts
    into one join against the training gram stream; aggregation is
    keyed on the bench doc id. Distinct-pair pre-aggregation keeps the
    join output at (bench_gram × distinct training docs), never raw
    occurrences."""
    bg = _doc_ngrams(bench, n, id_col, text_col).distinct()
    tg = _doc_ngrams(docs, n, id_col, text_col).distinct().withColumnRenamed(
        "id", "tid"
    )
    hits = F.broadcast(bg).join(tg, "gram").groupBy("id").agg(
        F.count_distinct("gram").alias("n_leaked"),
        F.count_distinct("tid").alias("n_train_docs"),
    )
    per_bench = bg.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        bench.select(F.col(id_col).alias("id"))
        .join(per_bench, "id", "left")
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce("n_leaked", F.lit(0)).cast("int").alias("n_leaked"),
            F.coalesce("n_train_docs", F.lit(0)).cast("int").alias("n_train_docs"),
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.coalesce("n_leaked", F.lit(0))
                    / F.col("n_grams").cast("double"),
                    4,
                ),
            )
            .otherwise(0.0)
            .alias("leak_frac"),
        )
    )


def ngram_repetition(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    cross_dup: bool = True,
) -> DataFrame:
    """Duplicate-n-gram quality signals (the Gopher/RefinedWeb filter
    family): per doc,

    - ``n_ngrams`` / ``n_distinct`` — total and distinct token n-grams,
    - ``rep_ratio`` — within-doc repetition, ``1 - distinct/total``,
    - ``cross_dup_frac`` — fraction of the doc's n-gram occurrences
      whose n-gram also appears in at least one OTHER document.

    Scale shape: explode to (doc, gram) rows — same row count as the
    postings build — one groupBy(gram) for corpus df (uniform hash key,
    map-side combine) and one groupBy(id) for the per-doc rollup. No
    pairwise joins; entirely JVM-side column expressions.

    Gram construction is posexplode + ``lead`` over a per-doc window,
    NOT a higher-order ``transform(sequence, slice...)`` lambda: the
    lambda path drops out of whole-stage codegen into per-element
    interpreted eval and measured ~15x slower at sf0.1 (9.4 s vs
    0.8 s); the window is partitioned by the high-cardinality doc id,
    so it stays scale-safe.

    Both rollups use only gram IDENTITY, never the text, so grams are
    xxhash64'd before the first shuffle: the (id, gram) aggregate and
    the df count move 8-byte keys instead of ~25-byte strings. A 64-bit
    collision merges two gram types — at 1e11 distinct corpus grams
    that perturbs ~3e-6 of types, shifting a doc's ratios by at most
    one occurrence; far below any quality threshold's margin.

    ``cross_dup=False`` (the pipeline's quality gate needs only
    ``rep_ratio``) omits the ``cross_dup_frac`` column and switches to
    a SHUFFLE-FREE per-row plan: without the corpus-df signal every
    output is a function of the row's own tokens, so the stats come
    from one Arrow-batched pandas UDF (:func:`gram_stats_udf`) instead
    of shuffling the exploded token stream three times. Values are
    bit-identical (exact integer counts either way; the ratio and its
    rounding stay JVM-side in the same expression).
    """
    if not cross_dup:
        gs = gram_stats_udf(n)(tokens_col(text_col))
        st = docs.select(F.col(id_col).alias("id"), gs.alias("_g"))
        return st.select(
            "id",
            F.col("_g.n_ngrams").alias("n_ngrams"),
            F.col("_g.n_distinct").alias("n_distinct"),
            F.when(
                F.col("_g.n_ngrams") > 0,
                F.round(
                    1.0
                    - F.col("_g.n_distinct")
                    / F.col("_g.n_ngrams").cast("double"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("rep_ratio"),
        )
    exploded = _doc_ngrams(docs, n, id_col, text_col)
    base = docs.select(F.col(id_col).alias("id"))
    # pre-aggregate to distinct (id, gram) with occurrence counts: after
    # this, per-gram df is a plain count and both per-doc aggregates are
    # distinct-free (no two-phase count_distinct expansion anywhere),
    # and the gram join carries distinct pairs instead of occurrences.
    per = exploded.select("id", F.xxhash64("gram").alias("g")).groupBy(
        "id", "g"
    ).agg(F.count(F.lit(1)).alias("occ"))
    gdf = per.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    per_doc = (
        per.join(gdf, "g")
        .groupBy("id")
        .agg(
            F.sum("occ").alias("n_ngrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.when(F.col("gdf") > 1, F.col("occ")).otherwise(0)
            ).alias("n_crossdup"),
        )
    )
    cols = [
        F.coalesce("n_ngrams", F.lit(0)).cast("int").alias("n_ngrams"),
        F.coalesce("n_distinct", F.lit(0)).cast("int").alias("n_distinct"),
        F.when(
            F.col("n_ngrams") > 0,
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_ngrams").cast("double"), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
        F.when(
            F.col("n_ngrams") > 0,
            F.round(F.col("n_crossdup") / F.col("n_ngrams").cast("double"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("cross_dup_frac"),
    ]
    return base.select("id").join(per_doc, "id", "left").select("id", *cols)


# GPT-2-flavored piece splitter (ASCII subset, engine-portable: the same
# pattern compiles identically under Java regex, RE2/DuckDB and Python):
# contractions, space-prefixed words/numbers, punctuation runs, spaces.
BPE_REGEX = r"'[a-z]{1,2}| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+| +"


def bpe_token_estimate(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_pieces, pieces_per_word) — whitespace
    token count plus a BPE-ish piece count (the brief's 'whitespace + a
    BPE-ish regex'). ``pieces_per_word`` approximates the token-inflation
    factor a real BPE vocabulary would report; all JVM-side regex, no
    Python in the path."""
    ws = F.size(F.expr(f"regexp_extract_all({text_col}, '[^ ]+', 0)"))
    pieces = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), \"{BPE_REGEX}\", 0)")
    )
    return docs.select(
        F.col(id_col).alias("id"),
        ws.cast("int").alias("n_ws_tokens"),
        pieces.cast("int").alias("n_bpe_pieces"),
        F.when(ws > 0, F.round(pieces / ws.cast("double"), 4))
        .otherwise(0.0)
        .alias("pieces_per_word"),
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, tfidf, kw_rank) — top-``k`` tf·idf keywords per doc.

    Classic corpus keyword extraction: ``tf(term, doc) · ln(N / df)``.
    Both shuffles key on high-cardinality columns ((id, term) then
    term), so Zipf skew can't hot-spot them; the per-doc top-k window
    partitions by doc id (never a global window). Ordering ties break
    on the ROUNDED score then term ascending — deterministic and
    engine-portable (the oracle ranks the identically rounded value).
    """
    from pyspark.sql import Window

    n_docs = docs.count()
    toks = tokens_col(text_col)
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").select(
        "id",
        "term",
        F.round(
            F.col("tf")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            4,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .where(F.col("kw_rank") <= k)
        .select("id", "term", "tfidf", "kw_rank")
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, avg_logprob) — unigram-LM perplexity proxy.

    The classic cheap stand-in for an LM-perplexity quality filter on
    training corpora: per-token log-probability under the corpus's own
    unigram distribution, averaged per doc (``Σ tf·ln(cf/T) / Σ tf``).
    Gibberish and boilerplate-heavy docs sit far from the corpus mean.
    One (id, term) aggregation + one vocabulary-keyed join — both
    high-cardinality keys, no broadcast assumption on the vocabulary
    (AQE may still choose one when it fits).
    """
    toks = tokens_col(text_col)
    # tf feeds both cf (whose total is collected below) and the per-doc
    # join: persist it (memory+disk) so the final action doesn't
    # re-tokenize the corpus a second time
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf")).collect()[0][0] or 0
    per_doc = (
        tf.join(cf, "term")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("int").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("cf").cast("double") / F.lit(float(max(total, 1))))
                )
                / F.sum("tf"),
                4,
            ).alias("avg_logprob"),
        )
    )
    # zero-token docs still answer, at logprob 0 (nothing to score)
    ids = docs.select(F.col(id_col).alias("id"))
    return (
        ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("avg_logprob"), F.lit(0.0)).alias("avg_logprob"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, n, pmi) — top-``top_n`` adjacent-bigram collocations by
    pointwise mutual information: ``ln((c_ab/B) / ((c_a/T)·(c_b/T)))``.

    Phrase mining over a training corpus (multi-word expressions to
    protect from chunk splits, vocabulary candidates). Adjacent bigrams
    only — the pair stream is linear in corpus size, never quadratic.
    ``min_count`` drops the noise floor BEFORE the unigram joins; the
    final top-n is a TakeOrdered over the surviving collocations, then
    ranked client-side semantics via deterministic (pmi desc, gram asc).
    """
    # both aggregates are vocabulary-sized; persist them so the two
    # total-count collects don't leave the final action re-scanning the
    # raw corpus for a third and fourth tokenize pass
    grams = _doc_ngrams(docs, 2, id_col, text_col)
    cab = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n")).persist()
    b_total = cab.agg(F.sum("n")).collect()[0][0] or 0
    uni = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .persist()
    )
    t_total = uni.agg(F.sum("cw")).collect()[0][0] or 0
    # F.get (null on out-of-bounds), NOT getItem: the join below derives
    # an isnotnull(_b) predicate that Catalyst pushes past the agg and
    # may evaluate BEFORE _doc_ngrams' lead-isnotnull filter — where the
    # doc-final rows still carry 1-token grams (concat_ws skips nulls)
    parts = F.split(F.col("gram"), " ")
    cand = (
        cab.where(F.col("n") >= min_count)
        .withColumn("_a", F.get(parts, 0))
        .withColumn("_b", F.get(parts, 1))
    )
    ua = uni.select(F.col("w").alias("_a"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("_b"), F.col("cw").alias("cb"))
    scored = (
        cand.join(ua, "_a")
        .join(ub, "_b")
        .select(
            "gram",
            F.col("n").cast("int").alias("n"),
            F.round(
                F.log(
                    (F.col("n") / F.lit(float(max(b_total, 1))))
                    / (
                        (F.col("ca") / F.lit(float(max(t_total, 1))))
                        * (F.col("cb") / F.lit(float(max(t_total, 1))))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("gram")).limit(top_n)


def vocab_coverage(
    docs: DataFrame,
    top_v: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rank, term, cf, df, coverage) — tokenizer-vocabulary builder.

    The top-``top_v`` terms by corpus frequency with cumulative corpus
    coverage: ``coverage`` at rank r is the fraction of ALL token
    occurrences covered by vocabulary entries 1..r — the curve a
    tokenizer team reads to size a vocabulary ("how big must V be for
    99% coverage?"). Ties break by term ascending so the ranking is
    deterministic across engines.

    Scale: ONE (term) aggregation with map-side combine (the same
    shuffle shape as the index build's term stats), a
    TakeOrderedAndProject for the top-V, and the running sum over the
    V bounded rows in one Arrow batch (same rationale as
    ranking.rank_small — no unpartitioned WindowExec). The corpus total
    rides along as a column (crossJoin with a 1-row aggregate), so no
    driver collect sits on the hot path.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    tf = (
        docs.select(
            F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"), F.count_distinct("id").alias("df"))
    )
    total = tf.agg(F.sum("cf").cast("double").alias("_t"))
    top = (
        tf.orderBy(F.desc("cf"), F.asc("term"))
        .limit(top_v)
        .crossJoin(F.broadcast(total))
    )
    schema = StructType(
        [
            StructField("rank", IntegerType(), False),
            StructField("term", StringType(), True),
            StructField("cf", LongType(), True),
            StructField("df", LongType(), True),
            StructField("coverage", DoubleType(), True),
        ]
    )

    def cum(batches):
        parts = [p for p in batches if not p.empty]
        if not parts:
            yield pd.DataFrame(columns=[f.name for f in schema.fields])
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(
            by=["cf", "term"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        pdf["rank"] = (pdf.index + 1).astype("int32")
        pdf["coverage"] = (pdf["cf"].cumsum() / pdf["_t"]).round(6)
        yield pdf[["rank", "term", "cf", "df", "coverage"]]

    return top.coalesce(1).mapInPandas(cum, schema=schema)


def oov_rate(
    docs: DataFrame,
    top_v: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_oov, oov_rate) — per-doc out-of-vocabulary
    fraction against the corpus's own top-``top_v`` vocabulary (see
    :func:`vocab_coverage`). The tokenizer-eval companion: docs with a
    high OOV rate under the production vocabulary are the ones that
    will fragment into byte-fallback garbage during training.

    Scale: the corpus is tokenized ONCE into a persisted per-(id, term)
    tf relation that feeds both the vocabulary aggregation and the
    per-doc join; the vocabulary is ≤ ``top_v`` rows — a broadcast
    left join — then one per-id aggregation. Zero-token docs answer
    with rate 0.
    """
    tf = (
        docs.select(
            F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("term")
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    vocab = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top_v)
        .select("term", F.lit(1).alias("_in_v"))
    )
    per_doc = (
        tf.join(F.broadcast(vocab), "term", "left")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("int").alias("n_tokens"),
            F.sum(F.when(F.col("_in_v").isNull(), F.col("tf")).otherwise(0))
            .cast("int")
            .alias("n_oov"),
        )
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
        F.round(
            F.coalesce(
                F.col("n_oov") / F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0)),
                F.lit(0.0),
            ),
            6,
        ).alias("oov_rate"),
    )


def length_histogram(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(bucket, lo, hi, n_docs, n_tokens) — corpus token-length
    histogram over power-of-two buckets (bucket b covers [2^b, 2^(b+1)),
    zero-token docs in bucket -1). The first chart in any corpus report:
    where the token mass sits, how heavy the short-doc tail is.

    The bucket id is ``bitlength(n_tokens) - 1`` computed via the
    base-2 string length — pure integer arithmetic, so engines can't
    disagree at power-of-two boundaries the way ``floor(log2(n))``
    can by one ulp. One narrow per-doc projection + a tiny groupBy
    (≤ ~40 buckets) — map-side combine collapses it before the shuffle.
    """
    n = F.size(tokens_col(text_col))
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.length(F.conv(n.cast("string"), 10, 2)) - 1
    ).cast("int")
    return (
        docs.select(bucket.alias("bucket"), n.alias("_n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("bigint").alias("n_tokens"),
        )
        .select(
            "bucket",
            F.when(F.col("bucket") < 0, F.lit(0.0))
            .otherwise(F.pow(F.lit(2.0), F.col("bucket")))
            .cast("bigint")
            .alias("lo"),
            F.when(F.col("bucket") < 0, F.lit(0.0))
            .otherwise(F.pow(F.lit(2.0), F.col("bucket") + 1) - 1)
            .cast("bigint")
            .alias("hi"),
            "n_docs",
            "n_tokens",
        )
        .orderBy("bucket")
    )
