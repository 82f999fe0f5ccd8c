"""Batch query serving: N queries through ONE postings scan.

At serving scale the per-query cost floor is Spark job overhead, not
data. The reference amortizes differently (long-lived per-partition
readers + replica racing, ``MiruLowestLatencySolver``); the Spark-native
equivalent is batching: all queries' term predicates union into one
postings scan, scores group by (query_id, docint), and a window takes
each query's top-k — one shuffle + one window for the whole batch.

Supports the fused query class (AND/OR of text terms/prefixes, plus
AND-with-NOT — the shape of the reference query set) and, via per-query
``opts``, the DisjunctionMax (``{"tie": t}``) and minimum-should-match
(``{"min_should_match": m}``) scoring variants — both ride the same
shared scan (dismax adds a max to the aggregation, msm raises the
presence threshold). Doc-metadata conjuncts (role:/tool:/ranges/authz
and their negations) peel off the text subtree exactly like the
single-query plan: ONE shared docs scan evaluates every masked query's
predicate and the (qid, docint) pairs filter the post-agg relation.

Exact phrases batch too (positions-bearing index): each phrase's
(term, offset) leaves join ONE shared positions scan; a phrase
occurrence at start s puts leaf i at position s+i, so exploding the
shift-normalized positions and counting distinct leaves per
(qid, docint, start) finds occurrences for EVERY phrase in the batch in
one groupBy — the batched twin of ``phrase_match_docs``'s
array-intersect chain. Scoring rides the same scan (member terms score
as ordinary leaves, ``search_phrase`` parity), and doc-metadata
conjuncts on a phrase ride the same shared mask docs scan as fused
queries' masks. Anything else (ordered proximity ``"a b"~N``, OR over
metadata) falls back to the single-query engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.ast import Phrase, Prefix, Term
from miru_spark.query.bm25 import (
    _fusable,
    _fusable_not,
    _meta_fields_known,
    _peel_meta_conjuncts,
    bm25_contrib,
    idf_col,
    msm_clauses,
    search,
    search_dismax,
    search_min_should_match,
)
from miru_spark.query.parser import parse_query


def _apply_masks(scored: DataFrame, index, mask_specs: dict) -> DataFrame:
    """Filter a (qid, docint, …) relation by the batch's doc-metadata
    masks: ONE docs scan evaluates every masked query's doc-level
    predicate, a doc emits the qids it satisfies, and the (qid, docint)
    pairs filter the relation — the batched twin of the single-query
    plan's mask semi-join. Shared by the fused and phrase blocks (each
    applies it to its own scored relation; non-masked qids pass
    through)."""
    if not mask_specs:
        return scored
    from miru_spark.query.filters import _meta_pred

    def _mask_pred(pos_meta, neg_meta):
        pred = F.lit(True)
        for l in pos_meta:
            pred = pred & _meta_pred(l)
        for l in neg_meta:
            pred = pred & ~F.coalesce(_meta_pred(l), F.lit(False))
        return pred

    qid_arr = F.array_compact(
        F.array(
            *[
                F.when(_mask_pred(pm, nm), F.lit(q))
                for q, (pm, nm) in sorted(mask_specs.items())
            ]
        )
    )
    mask_pairs = index.docs.select("docint", F.explode(qid_arr).alias("qid"))
    return (
        scored.join(
            mask_pairs.withColumn("_mok", F.lit(1)),
            ["qid", "docint"],
            "left",
        )
        .where(
            (~F.col("qid").isin(sorted(mask_specs))) | F.col("_mok").isNotNull()
        )
        .drop("_mok")
    )


def search_batch(
    index: InvertedIndex,
    queries: list[tuple],
) -> DataFrame:
    """``[(query_id, query_string, k[, opts])]`` → rows
    (query_id, conv_id, turn_idx, docint, score, rank).

    ``opts`` (optional dict) selects a scoring variant for that query:

    - ``{"tie": t}`` — DisjunctionMax with tie-breaker ``t``
      (:func:`miru_spark.query.bm25.search_dismax` parity);
    - ``{"min_should_match": m}`` — m-of-n SHOULD matching
      (:func:`miru_spark.query.bm25.search_min_should_match` parity;
      clause counting via the shared :func:`bm25.msm_clauses`, so
      synonym/multiterm OR-groups count as ONE clause).

    Results per query are identical to the corresponding single-query
    function (rank = 1..k in (score desc, docint desc) order). All
    variants ride the same ONE postings scan: dismax adds a per-group
    max to the shared aggregation, msm raises the presence threshold —
    neither costs an extra scan or shuffle.
    """
    spark = index.postings.sparkSession
    # (qid, leaf_id, kind, value, boost, mode, required, k, neg, tie)
    fused_rows = []
    # (qid, off, term, boost, k, n_leaves) — exact-phrase leaves
    phrase_rows: list[tuple] = []
    fallback: list[tuple[str, str, int, dict]] = []
    from miru_spark.query.filters import expand_multiterm

    # qid -> (pos_meta, neg_meta) doc-mask conjuncts peeled off fused
    # queries (bm25._peel_meta_conjuncts): evaluated in ONE shared docs
    # scan and applied as a (qid, docint) join after the aggregation
    mask_specs: dict[str, tuple[list, list]] = {}
    for item in queries:
        qid, qs, k = item[0], item[1], item[2]
        opts = item[3] if len(item) > 3 else {}
        tie = opts.get("tie")
        msm = opts.get("min_should_match")
        if tie is not None and msm is not None:
            raise ValueError(f"{qid}: tie and min_should_match are exclusive")
        # the MultiTermQuery rewrite makes wildcard/fuzzy queries
        # fusable into the shared scan instead of falling back
        node = expand_multiterm(index, parse_query(qs, index.analyzer))

        if msm is not None:
            # mirror search_min_should_match exactly: no metadata peel
            # (the single-query path rejects meta conjuncts), clause
            # grouping via the shared collector, presence counted per
            # CLAUSE (leaf_id = clause id, so an OR-group's members
            # share one id and a term in several clauses counts each)
            clauses = msm_clauses(node)
            if not clauses:
                raise ValueError(
                    f"{qid}: min_should_match needs an OR/AND of text clauses"
                )
            for ci, cl in enumerate(clauses):
                lb: dict[tuple[bool, str], float] = {}
                for l in cl:
                    key = (isinstance(l, Prefix), l.value)
                    lb[key] = max(lb.get(key, 0.0), l.boost)
                for (is_pref, val), boost in sorted(lb.items()):
                    fused_rows.append(
                        (qid, ci, "prefix" if is_pref else "term", val,
                         boost, "msm", int(msm), k, False, None)
                    )
            continue

        sub, pos_meta, neg_meta = _peel_meta_conjuncts(node)
        if (
            isinstance(sub, Phrase)
            and sub.slop == 0
            and len(sub.values) >= 2
            and tie is None
            and "positions" in index.postings.columns
            and (
                not (pos_meta or neg_meta)
                or _meta_fields_known(index, [*pos_meta, *neg_meta])
            )
        ):
            # exact phrase → shared positional scan (see module doc);
            # leaf per (term, offset) occurrence in the phrase. Doc-
            # metadata conjuncts ride the SAME shared mask docs scan as
            # fused queries' masks.
            if pos_meta or neg_meta:
                mask_specs[qid] = (pos_meta, neg_meta)
            for off, val in enumerate(sub.values):
                phrase_rows.append(
                    (qid, off, val, float(sub.boost), k, len(sub.values))
                )
            continue
        if sub is None or (
            (pos_meta or neg_meta)
            and not _meta_fields_known(index, [*pos_meta, *neg_meta])
        ):
            fallback.append((qid, qs, k, opts))
            continue
        f = _fusable(sub)
        neg_leaves: list = []
        if f is None:
            # AND-with-NOT joins the shared scan too: negated terms ride
            # as weightless presence rows (see bm25._fusable_not)
            fn = _fusable_not(sub)
            if fn is None or tie is not None:
                fallback.append((qid, qs, k, opts))
                continue
            f, neg_leaves = ("and", fn[0]), fn[1]
        if tie is not None and f[0] == "and" and len(f[1]) > 1:
            # DisjunctionMax is inherently disjunctive — same rejection
            # as search_dismax (an AND must not score with OR matching)
            raise ValueError(f"{qid}: dismax needs a fusable OR text query")
        if pos_meta or neg_meta:
            mask_specs[qid] = (pos_meta, neg_meta)
        mode, leaves = f
        required_mode = "or" if tie is not None else mode
        # dedupe leaves by (kind, value) — same AND-presence semantics as
        # the single-query path; identical leaves at different '^B'
        # boosts collapse to one presence leaf at the MAX boost (a term
        # matched by several leaves takes the max weight, mirroring
        # bm25._query_term_weights)
        lb = {}
        for l in leaves:
            key = (isinstance(l, Prefix), l.value)
            lb[key] = max(lb.get(key, 0.0), l.boost)
        seen = sorted(lb.items())
        required = len(seen) if required_mode == "and" else 1
        for i, ((is_pref, val), boost) in enumerate(seen):
            fused_rows.append(
                (
                    qid,
                    i,
                    "prefix" if is_pref else "term",
                    val,
                    boost,
                    required_mode,
                    required,
                    k,
                    False,
                    float(tie) if tie is not None else None,
                )
            )
        # negated leaves: distinct leaf_ids past the positives (they are
        # excluded from the AND-presence count), boost irrelevant (their
        # rows never score)
        negset = sorted({(isinstance(l, Prefix), l.value) for l in neg_leaves})
        for j, (is_pref, val) in enumerate(negset):
            fused_rows.append(
                (
                    qid,
                    len(seen) + j,
                    "prefix" if is_pref else "term",
                    val,
                    1.0,
                    required_mode,
                    required,
                    k,
                    True,
                    None,
                )
            )

    parts: list[DataFrame] = []
    if fused_rows:
        leaves_df = spark.createDataFrame(
            fused_rows,
            "qid string, leaf_id int, kind string, value string, "
            "boost double, mode string, required int, k int, "
            "neg boolean, tie double",
        )
        # resolve leaves → concrete terms (prefix expansion via the
        # term-stats table, exact via equi-join)
        exact = leaves_df.where(F.col("kind") == "term").withColumnRenamed(
            "value", "term"
        )
        pref = leaves_df.where(F.col("kind") == "prefix")
        terms_tbl = index.terms.select(
            "term", idf_col(F.col("df"), index.n_docs).alias("idf")
        )
        resolved = exact.join(terms_tbl, "term", "inner")
        if any(r[2] == "prefix" for r in fused_rows):
            expanded = pref.join(
                terms_tbl,
                terms_tbl["term"].startswith(pref["value"]),
                "inner",
            ).drop("value")
            resolved = resolved.unionByName(expanded)
        # a term matched by SEVERAL leaves of one query (e.g. exact
        # 'w00001' plus overlapping prefix 'w0000*') must contribute its
        # BM25 weight exactly ONCE — the per-leaf rows exist only for the
        # count_distinct(leaf_id) AND-presence check. Mark one scoring
        # row per (qid, term), choosing the leaf with the MAX boosted
        # weight (parity with bm25._query_term_weights); the window runs
        # over the tiny driver-built leaf table, before the postings join.
        resolved = resolved.withColumn("w", F.col("idf") * F.col("boost"))
        # positive rows outrank negated ones for the scoring slot — a
        # term that is both positive and negated in one query must still
        # contribute its weight (the neg flag then disqualifies the doc)
        wlr = Window.partitionBy("qid", "term").orderBy(
            F.asc("neg"), F.desc("w"), F.asc("leaf_id")
        )
        resolved = F.broadcast(
            resolved.withColumn("_lr", F.row_number().over(wlr)).select(
                "qid", "leaf_id", "term", "w", "mode", "required", "k",
                "neg", "tie", "_lr",
            )
        )
        # push a coarse term predicate into the postings SCAN: every
        # leaf value is a driver-side literal, so the union of exact
        # terms (In) and prefixes (StringStartsWith — parquet pushes
        # both) prunes row groups before the broadcast join refines
        # per-query. Without this the batch pays a FULL postings scan.
        exact_vals = sorted({r[3] for r in fused_rows if r[2] == "term"})
        pref_vals = sorted({r[3] for r in fused_rows if r[2] == "prefix"})
        scan_pred = None
        if exact_vals:
            scan_pred = F.col("term").isin(exact_vals)
        for p in pref_vals:
            sp = F.col("term").startswith(p)
            scan_pred = sp if scan_pred is None else (scan_pred | sp)
        postings = index.postings.where(scan_pred)
        hits = (
            postings.join(resolved, "term")
            .withColumn(
                "contrib",
                F.when((F.col("_lr") == 1) & (~F.col("neg")),
                       bm25_contrib(
                           F.col("tf").cast("double"),
                           F.col("w"),
                           F.col("doclen").cast("double"),
                           index.avg_doclen,
                       )).otherwise(F.lit(0.0)),
            )
        )
        scored = (
            hits.groupBy("qid", "docint")
            .agg(
                F.sum("contrib").alias("_sum"),
                F.max("contrib").alias("_mx"),
                F.count_distinct(
                    F.when(~F.col("neg"), F.col("leaf_id"))
                ).alias("_nl"),
                F.max(F.when(F.col("neg"), 1).otherwise(0)).alias("_ng"),
                F.first("required").alias("_need"),
                F.first("k").alias("_k"),
                F.first("tie").alias("_tie"),
            )
            # one HAVING for every mode: AND sets required = n_leaves
            # (count can't exceed it, so >= is ==), OR sets 1, msm m
            .where((F.col("_nl") >= F.col("_need")) & (F.col("_ng") == 0))
            .withColumn(
                "score",
                F.when(
                    F.col("_tie").isNotNull(),
                    # DisjunctionMax: best clause + tie x the rest
                    F.col("_mx")
                    + F.col("_tie") * (F.col("_sum") - F.col("_mx")),
                ).otherwise(F.col("_sum")),
            )
        )
        scored = _apply_masks(scored, index, mask_specs)
        if index.tombstones is not None:
            scored = scored.join(
                index.tombstones.select("docint"), "docint", "left_anti"
            )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.desc("docint"))
        topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("_k"))
            .select("qid", "docint", "score", "rank")
        )
        parts.append(topk)

    if phrase_rows:
        pl = spark.createDataFrame(
            phrase_rows,
            "qid string, off int, term string, boost double, k int, n_leaves int",
        )
        # resolve member terms against the term-stats table (idf), pick
        # ONE scoring row per (qid, term) — a term repeated at several
        # phrase offsets scores once (search_phrase parity: distinct
        # member terms), lowest offset wins deterministically
        terms_tbl = index.terms.select(
            "term", idf_col(F.col("df"), index.n_docs).alias("idf")
        )
        wpr = Window.partitionBy("qid", "term").orderBy(F.asc("off"))
        plw = F.broadcast(
            pl.join(terms_tbl, "term")
            .withColumn("_lr", F.row_number().over(wpr))
            .withColumn("w", F.col("idf") * F.col("boost"))
        )
        # ONE positions-bearing postings scan with the union term
        # predicate pushed (In(term, …) → parquet row-group pruning)
        terms_needed = sorted({r[2] for r in phrase_rows})
        pscan = index.postings.where(F.col("term").isin(terms_needed))
        pj = pscan.join(plw, "term")
        # occurrence check: leaf i of a phrase occurrence starting at s
        # sits at position s+i, so shift-normalized starts that carry
        # ALL leaves are occurrences — one groupBy for every phrase
        occ = pj.select(
            "qid",
            "docint",
            "off",
            "n_leaves",
            F.explode("positions").alias("p"),
        ).withColumn("start", F.col("p") - F.col("off"))
        matched = (
            occ.groupBy("qid", "docint", "start")
            .agg(
                F.count_distinct("off").alias("_no"),
                F.first("n_leaves").alias("_need"),
            )
            .where(F.col("_no") == F.col("_need"))
            .select("qid", "docint")
            .distinct()
        )
        scored_p = (
            pj.where(F.col("_lr") == 1)
            .withColumn(
                "contrib",
                bm25_contrib(
                    F.col("tf").cast("double"),
                    F.col("w"),
                    F.col("doclen").cast("double"),
                    index.avg_doclen,
                ),
            )
            .groupBy("qid", "docint")
            .agg(F.sum("contrib").alias("score"), F.first("k").alias("_k"))
            # hash build on the match set (docs containing the phrase —
            # small next to the scored term-match relation)
            .join(matched.hint("shuffle_hash"), ["qid", "docint"], "left_semi")
        )
        scored_p = _apply_masks(scored_p, index, mask_specs)
        if index.tombstones is not None:
            scored_p = scored_p.join(
                index.tombstones.select("docint"), "docint", "left_anti"
            )
        wp = Window.partitionBy("qid").orderBy(F.desc("score"), F.desc("docint"))
        parts.append(
            scored_p.withColumn("rank", F.row_number().over(wp))
            .where(F.col("rank") <= F.col("_k"))
            .select("qid", "docint", "score", "rank")
        )

    for qid, qs, k, opts in fallback:
        # rank the k already-limited rows in one Arrow batch — an
        # unpartitioned window would warn per execution, and a constant
        # partition key gets folded back to the empty spec
        from miru_spark.ranking import rank_small

        if opts.get("tie") is not None:
            res = search_dismax(index, qs, tie_breaker=opts["tie"], k=k)
        elif opts.get("min_should_match") is not None:
            res = search_min_should_match(
                index, qs, m=opts["min_should_match"], k=k
            )
        else:
            res = search(index, qs, k=k)
        one = rank_small(
            res.select(F.lit(qid).alias("qid"), "docint", "score"),
            [("score", "desc"), ("docint", "desc")],
        ).select("qid", "docint", "score", "rank")
        parts.append(one)

    if not parts:
        raise ValueError("no queries")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    meta = index.docs.select("docint", "conv_id", "turn_idx")
    return (
        # the union of per-query top-ks is ≤ Σ k rows — broadcast it
        # against the docs scan instead of shuffling the metadata side
        F.broadcast(out).join(meta, "docint")
        .select(
            F.col("qid").alias("query_id"),
            "conv_id",
            "turn_idx",
            "docint",
            "score",
            "rank",
        )
        .orderBy("query_id", "rank")
    )
