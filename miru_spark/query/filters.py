"""Filter-tree evaluation: AST → DataFrame of matching docints.

Reference semantics: ``MiruAggregateUtil.filter/filterInOut``
(``miru-plugin/.../solution/MiruAggregateUtil.java:1098-1202``) — each
field filter ORs the bitmaps of its term values (exact or wildcard
range expansion :1154-1170), nodes combine with and/or/pButNotQ
(``executeFilter:1222-1241``), and a pure-negation branch is seeded with
the full index mask (``inclusiveFilter``, :1139-1141).

Spark re-expression: a term leaf is a *filter on the postings table*
(index-only access — never a corpus scan), AND is an inner join chain on
``docint``, OR a union+distinct, NOT a left_anti join. Term leaves of
one AND/OR node are fused into a single ``isin``/``startswith`` postings
scan + groupBy instead of N joins (one shuffle, not N).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.ast import (
    DEFAULT_FIELD,
    And,
    AuthzAny,
    Fuzzy,
    Node,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    Regexp,
    Term,
    Wildcard,
)


def like_pattern(wildcard: str) -> str:
    """Lucene wildcard syntax → SQL LIKE (``*``→``%``, ``?``→``_``,
    pre-existing LIKE metacharacters escaped)."""
    out = []
    for ch in wildcard:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _leaf_pred(leaf) -> Column:
    """Term-dictionary predicate for a text leaf (applies to any table
    with a ``term`` column: postings or term stats)."""
    if isinstance(leaf, Term):
        return F.col("term") == leaf.value
    if isinstance(leaf, Wildcard):
        return F.col("term").like(like_pattern(leaf.pattern))
    if isinstance(leaf, Regexp):
        return F.col("term").rlike(f"^(?:{leaf.pattern})$")
    if isinstance(leaf, Fuzzy):
        # length band first: cheap JVM check short-circuits the
        # levenshtein for almost the whole dictionary
        band = (
            F.abs(F.length(F.col("term")) - F.lit(len(leaf.value)))
            <= leaf.max_edits
        )
        return band & (
            F.levenshtein(F.col("term"), F.lit(leaf.value)) <= leaf.max_edits
        )
    return F.col("term").startswith(leaf.value)


def text_leaves_pred(leaves) -> Column | None:
    """OR of the term predicates of ``leaves`` (None if empty) — the
    single-scan postings/term-stats predicate shared by the filter
    evaluator and the BM25 scorer."""
    preds = [_leaf_pred(l) for l in leaves]
    return reduce(lambda a, b: a | b, preds) if preds else None


def expand_multiterm(index: "InvertedIndex", node: Node, cap: int = 1024) -> Node:
    """Lucene's MultiTermQuery → TermInSet rewrite: resolve text-field
    Wildcard/Fuzzy/Regexp leaves against the TERM DICTIONARY (the tiny
    cached term-stats relation) into an OR of exact terms, BEFORE
    planning.

    Why: a LIKE/levenshtein predicate evaluated on the postings table is
    a full postings scan — no parquet row-group pruning, no fused plan.
    After the rewrite the postings access is an equality-set probe
    (min/max-prunable on the term-sorted segments) and the query joins
    the fused single-scan class. The dictionary probe collects at most
    ``cap`` + 1 scalar term rows per leaf; a leaf matching more than
    ``cap`` terms keeps its scan predicate (the honest fallback — at
    that selectivity the scan IS the right plan). A leaf matching
    nothing becomes an impossible exact term, preserving shape."""
    if isinstance(node, (Wildcard, Fuzzy, Regexp)) and node.field == DEFAULT_FIELD:
        matched = [
            r["term"]
            for r in index.terms.where(_leaf_pred(node))
            .select("term")
            .limit(cap + 1)
            .collect()
        ]
        if len(matched) > cap:
            return node
        if not matched:
            return Term("￿￿", boost=node.boost)
        if len(matched) == 1:
            return Term(matched[0], boost=node.boost)
        return Or(tuple(Term(v, boost=node.boost) for v in sorted(matched)))
    if isinstance(node, Not):
        return Not(expand_multiterm(index, node.child, cap))
    if isinstance(node, And):
        return And(tuple(expand_multiterm(index, c, cap) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(expand_multiterm(index, c, cap) for c in node.children))
    return node


def _is_text_leaf(n: Node) -> bool:
    return (
        isinstance(n, (Term, Prefix, Wildcard, Fuzzy, Regexp))
        and n.field == DEFAULT_FIELD
    )


def _meta_pred(leaf) -> Column:
    c = F.col(leaf.field)
    if isinstance(leaf, Wildcard):
        return c.like(like_pattern(leaf.pattern))
    if isinstance(leaf, Regexp):
        return c.rlike(f"^(?:{leaf.pattern})$")
    if isinstance(leaf, Fuzzy):
        return F.levenshtein(c, F.lit(leaf.value)) <= leaf.max_edits
    if isinstance(leaf, AuthzAny):
        # any-of over the doc's authz array (MiruAuthzUtils.java:24-33:
        # composite OR of per-value bitmaps; here one arrays_overlap
        # against the tiny literal array — JVM-side, no explode)
        return F.arrays_overlap(c, F.array(*[F.lit(v) for v in leaf.values]))
    if isinstance(leaf, Range):
        lit = _range_lit(leaf.field)
        pred = F.lit(True)
        if leaf.lo is not None:
            lo = lit(leaf.lo)
            pred = pred & ((c >= lo) if leaf.lo_inc else (c > lo))
        if leaf.hi is not None:
            hi = lit(leaf.hi)
            pred = pred & ((c <= hi) if leaf.hi_inc else (c < hi))
        return pred
    if isinstance(leaf, Term):
        return c == leaf.value
    return c.startswith(leaf.value)


def _range_lit(field: str):
    """Typed literal builder per range field: ranges compare in the
    COLUMN's type (int for turn_idx, timestamp for ts) so parquet
    min/max stats stay usable — comparing a ts column to a string would
    otherwise degrade to string casts row-by-row."""
    if field == "turn_idx":
        return lambda v: F.lit(int(v))
    if field == "ts":
        return lambda v: F.to_timestamp(F.lit(v))
    return F.lit


class FilterEvaluator:
    """Evaluates a filter AST against an :class:`InvertedIndex`."""

    def __init__(self, index: InvertedIndex):
        self.index = index

    def matching_docs(self, node: Node) -> DataFrame:
        """DataFrame with a single ``docint`` column (distinct)."""
        return self._eval(expand_multiterm(self.index, node))

    # -- node dispatch -----------------------------------------------------

    def _eval(self, node: Node) -> DataFrame:
        if _is_text_leaf(node):
            return self._text_leaves_any([node])
        if isinstance(node, Range) and node.field == DEFAULT_FIELD:
            return self._text_numeric_range(node)
        if isinstance(node, Phrase):
            # positional phrase over the positions-bearing postings
            # (query/phrase.py; clear error if built without positions)
            from miru_spark.query.phrase import phrase_match_docs

            # node.values are ALREADY analyzed by parse_query — pass
            # the term sequence through (re-analysis is not idempotent
            # and the latin-only re-tokenize dropped non-latin terms)
            return phrase_match_docs(self.index, node.values, slop=node.slop)
        if isinstance(node, (Term, Prefix, Range, AuthzAny, Wildcard, Fuzzy, Regexp)):
            return self._meta_leaf(node)
        if isinstance(node, Or):
            return self._or(node.children)
        if isinstance(node, And):
            return self._and(node.children)
        if isinstance(node, Not):
            # top-level NOT: full index mask minus child
            # (MiruAggregateUtil.java:1139-1141 inclusiveFilter seed)
            full = self.index.docs.select("docint")
            return full.join(self._eval(node.child), "docint", "left_anti")
        raise TypeError(f"unknown node {node!r}")

    def _meta_leaf(self, leaf) -> DataFrame:
        return self.index.docs.where(_meta_pred(leaf)).select("docint")

    def _text_numeric_range(self, leaf: Range) -> DataFrame:
        """Numeric-token term range (``text:[100 TO 250]``): docs with
        any NUMERIC token whose value falls in the range — the
        reference's numeric-lex term scan (``MiruTermComposer.java:
        35-119`` encodes numbers as lex-ordered term bytes and range-
        scans the term dictionary; exercised by the fulltext test's
        numeric ``obj`` field, ``MiruFullTextNGTest.java:52-60``). Here
        the term dictionary is the postings ``term`` column: try_cast
        marks numeric terms (null-safe under ANSI mode) and the bounds
        compare numerically, so '007' matches [5 TO 10] exactly as the
        reference's value encoding would."""
        t = F.expr("try_cast(term AS BIGINT)")
        pred = t.isNotNull()
        if leaf.lo is not None:
            lo = int(leaf.lo)
            pred = pred & ((t >= lo) if leaf.lo_inc else (t > lo))
        if leaf.hi is not None:
            hi = int(leaf.hi)
            pred = pred & ((t <= hi) if leaf.hi_inc else (t < hi))
        return self.index.postings.where(pred).select("docint").distinct()

    def _text_leaves_any(self, leaves: list) -> DataFrame:
        """OR of text leaves as ONE postings scan (fused isin/prefix)."""
        pred = reduce(lambda a, b: a | b, (_leaf_pred(l) for l in leaves))
        return self.index.postings.where(pred).select("docint").distinct()

    def _text_terms_all(self, terms: list[Term]) -> DataFrame:
        """AND of exact text terms as ONE postings scan + groupBy:
        docs where count(distinct matched term) == n_terms."""
        values = sorted({t.value for t in terms})
        return (
            self.index.postings.where(F.col("term").isin(values))
            .groupBy("docint")
            .agg(F.count_distinct("term").alias("_nt"))
            .where(F.col("_nt") == len(values))
            .select("docint")
        )

    def _or(self, children: tuple) -> DataFrame:
        text = [c for c in children if _is_text_leaf(c)]
        rest = [c for c in children if not _is_text_leaf(c)]
        parts: list[DataFrame] = []
        if text:
            parts.append(self._text_leaves_any(text))
        parts.extend(self._eval(c) for c in rest)
        return reduce(lambda a, b: a.unionByName(b), parts).distinct()

    def _and(self, children: tuple) -> DataFrame:
        pos = [c for c in children if not isinstance(c, Not)]
        neg = [c.child for c in children if isinstance(c, Not)]
        exact = [c for c in pos if isinstance(c, Term) and c.field == DEFAULT_FIELD]
        rest = [c for c in pos if not (isinstance(c, Term) and c.field == DEFAULT_FIELD)]
        parts: list[DataFrame] = []
        if exact:
            parts.append(self._text_terms_all(exact))
        parts.extend(self._eval(c) for c in rest)
        if not parts:
            # pure-NOT conjunction: seed with full index mask
            base = self.index.docs.select("docint")
        else:
            base = reduce(lambda a, b: a.join(b, "docint"), parts)
        for n in neg:
            base = base.join(self._eval(n), "docint", "left_anti")
        return base


def row_predicate(node: Node, tokens: Column) -> Column:
    """Evaluate a filter tree directly against ONE document row — a
    boolean column over (tokens array, metadata columns).

    The index-backed :class:`FilterEvaluator` answers "which docs match"
    over the corpus; this answers "does THIS row match", which is what
    per-batch streaming consumers need (realtime delivery matches each
    ingested activity against registered subscriptions — the reference
    pushes ids at ingest time, MiruLocalHostedPartition.java realtime
    delivery hook). Pure column expressions: text terms via
    array_contains / exists-startswith on the token array, metadata
    leaves via the same typed predicates the evaluator uses."""
    if _is_text_leaf(node):
        if isinstance(node, Term):
            return F.array_contains(tokens, node.value)
        if isinstance(node, Wildcard):
            pat = like_pattern(node.pattern)
            return F.exists(tokens, lambda t: t.like(pat))
        if isinstance(node, Regexp):
            anchored = f"^(?:{node.pattern})$"
            return F.exists(tokens, lambda t: t.rlike(anchored))
        if isinstance(node, Fuzzy):
            return F.exists(
                tokens,
                lambda t: F.levenshtein(t, F.lit(node.value))
                <= F.lit(node.max_edits),
            )
        return F.exists(tokens, lambda t: t.startswith(node.value))
    if isinstance(node, Phrase):
        if node.slop == 0:
            # adjacency == substring of the space-joined token stream
            joined = F.concat(F.lit(" "), F.array_join(tokens, " "), F.lit(" "))
            return joined.contains(" " + " ".join(node.values) + " ")
        # ordered proximity: same greedy position chain as
        # phrase.proximity_match_docs, over THIS row's token array
        from miru_spark.query.phrase import _advance

        def _positions(w: str) -> Column:
            return F.filter(
                F.transform(tokens, lambda t, i: F.when(t == F.lit(w), i)),
                lambda x: x.isNotNull(),
            )

        carry = F.transform(
            _positions(node.values[0]),
            lambda p: F.struct(p.alias("start"), p.alias("cur")),
        )
        for w in node.values[1:]:
            carry = _advance(carry, _positions(w))
        window = len(node.values) - 1 + node.slop
        return F.exists(carry, lambda s: s["cur"] - s["start"] <= F.lit(window))
    if isinstance(node, Range) and node.field == DEFAULT_FIELD:
        # numeric-token range against THIS row's token array
        def _in_range(t):
            v = t.try_cast("bigint")
            pred = v.isNotNull()
            if node.lo is not None:
                lo = int(node.lo)
                pred = pred & ((v >= lo) if node.lo_inc else (v > lo))
            if node.hi is not None:
                hi = int(node.hi)
                pred = pred & ((v <= hi) if node.hi_inc else (v < hi))
            return pred

        return F.exists(tokens, _in_range)
    if isinstance(node, (Term, Prefix, Range, AuthzAny, Wildcard, Fuzzy, Regexp)):
        return _meta_pred(node)
    if isinstance(node, And):
        return reduce(
            lambda a, b: a & b, (row_predicate(c, tokens) for c in node.children)
        )
    if isinstance(node, Or):
        return reduce(
            lambda a, b: a | b, (row_predicate(c, tokens) for c in node.children)
        )
    if isinstance(node, Not):
        return ~row_predicate(node.child, tokens)
    raise TypeError(f"unsupported node: {node!r}")
