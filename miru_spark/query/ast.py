"""Filter AST — the engine's IR between query strings and DataFrame plans.

Mirrors the reference's ``MiruFilter{operation, fieldFilters, subFilters}``
tree (``miru-api/.../query/filter/MiruFilter.java``) with the three
supported combinators ``and | or | pButNotQ``
(``MiruFilterOperation.java:10-23``; ``MiruAggregateUtil.executeFilter``
throws on anything else, ``MiruAggregateUtil.java:1222-1241``) and the two
supported leaf predicates — exact term and trailing-``*`` prefix
(``LuceneBackedQueryParser.makeFilter:94-108``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_FIELD = "text"


@dataclass(frozen=True)
class Term:
    value: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0  # Lucene '^N' clause boost (scoring multiplier)


@dataclass(frozen=True)
class Prefix:
    value: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase:
    """Quoted positional phrase (``"hash join"``): terms must appear
    consecutively in analyzed-token order. Beyond the reference's
    bag-of-terms fulltext (its LuceneBackedQueryParser strips quotes to
    an AND, LuceneBackedQueryParser.java:94-108); served here via the
    positions-bearing postings (query/phrase.py). Scoring contributes
    the member terms like ordinary text leaves.

    ``slop`` (the ``"a b"~2`` suffix) relaxes adjacency to ordered
    proximity: the terms must appear in order within a window of
    ``len(values) - 1 + slop`` positions (slop 0 = exact phrase)."""

    values: tuple[str, ...]
    field: str = DEFAULT_FIELD
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    """Wildcard term (``fo*bar``, ``f?x``): ``*`` matches any run of
    characters, ``?`` exactly one. Lucene-grammar parity (the reference
    delegates query strings to Lucene's parser, which accepts
    WildcardQuery; its own re-parse keeps only term/prefix/boolean,
    LuceneBackedQueryParser.java:94-108 — this engine serves the full
    form). Resolved against the term dictionary (a LIKE scan of the
    small term-stats table), then served like an OR of the matched
    terms; matched terms contribute BM25 weight like ordinary leaves.
    Leading wildcards are allowed — the dictionary scan is linear in
    vocabulary, not corpus."""

    pattern: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Regexp:
    """Regexp term (``/s.a[nr]k?/``, Lucene RegexpQuery syntax): the
    pattern must match a WHOLE dictionary term (anchored). Resolved
    against the term dictionary like Wildcard/Fuzzy and rewritten to an
    exact term set by ``filters.expand_multiterm``."""

    pattern: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy:
    """Fuzzy term (``spark~1``, ``spark~``): matches dictionary terms
    within ``max_edits`` Levenshtein distance (Lucene FuzzyQuery
    semantics; bare ``~`` = 2 edits, Lucene's default). Resolved with a
    length-banded levenshtein scan of the term dictionary; matched
    terms contribute BM25 weight like ordinary leaves."""

    value: str
    max_edits: int = 2
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Range:
    """Typed metadata range — the engine's answer to the reference's
    numeric-lex term ranges (``MiruTermComposer.java:35-119`` encodes
    numbers as lex-ordered bytes and scans ``prefixLowerInclusive`` →
    ``prefixUpperExclusive``, ``MiruFieldDefinition.java:139-198``).
    Spark keeps metadata in TYPED columns, so a range is a plain
    comparison predicate that parquet min/max stats can prune; no term
    encoding needed. ``lo``/``hi`` are raw strings (None = unbounded),
    cast by the evaluator per the field's type."""

    field: str
    lo: str | None = None
    hi: str | None = None
    lo_inc: bool = True
    hi_inc: bool = True


@dataclass(frozen=True)
class AuthzAny:
    """Authz predicate: doc's ``authz`` array must intersect the query's
    allowed values (reference ``MiruAuthzExpression`` — a list of authz
    strings, composite OR; ``MiruAuthzUtils.java:24-33``)."""

    values: tuple
    field: str = "authz"


@dataclass(frozen=True)
class And:
    children: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class Or:
    children: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class Not:
    """Negation — only valid inside And (p AND NOT q == pButNotQ)."""

    child: object = None


Node = object


def positive_text_leaves(node: Node) -> list:
    """Collect non-negated text-field Term/Prefix leaves — the scoring
    terms (the reference scores every query term over the filtered
    answer set, FullText.java:139-199)."""
    out: list = []

    def walk(n: Node, negated: bool) -> None:
        if isinstance(n, (Term, Prefix, Wildcard, Fuzzy, Regexp)):
            if not negated and n.field == DEFAULT_FIELD:
                out.append(n)
        elif isinstance(n, Phrase):
            if not negated and n.field == DEFAULT_FIELD:
                out.extend(Term(v, boost=n.boost) for v in n.values)
        elif isinstance(n, Not):
            walk(n.child, not negated)
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c, negated)

    walk(node, False)
    return out


def expand_synonyms(node: Node, mapping: dict[str, list[str]]) -> Node:
    """Rewrite text Terms through a synonym map: ``Term(v)`` becomes
    ``Or(Term(v), Term(s1), …)`` when ``mapping[v]`` exists — Lucene's
    query-time SynonymGraph as plain boolean OR expansion (the
    BooleanQuery rewrite; each synonym scores as its own term). Only
    positive text-field terms expand — negated terms keep their exact
    meaning (``NOT x`` must not grow to exclude synonyms silently), and
    metadata/range/phrase leaves pass through untouched."""

    def rewrite(n: Node, negated: bool) -> Node:
        if isinstance(n, Term) and n.field == DEFAULT_FIELD and not negated:
            syns = mapping.get(n.value)
            if syns:
                alts = (n, *(Term(s, n.field, n.boost) for s in syns))
                return Or(alts)
            return n
        if isinstance(n, And):
            return And(tuple(rewrite(c, negated) for c in n.children))
        if isinstance(n, Or):
            return Or(tuple(rewrite(c, negated) for c in n.children))
        if isinstance(n, Not):
            return Not(rewrite(n.child, True))
        return n

    return rewrite(node, False)
