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


@dataclass(frozen=True)
class Prefix:
    value: str
    field: str = DEFAULT_FIELD


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
        if isinstance(n, (Term, Prefix)):
            if not negated and n.field == DEFAULT_FIELD:
                out.append(n)
        elif isinstance(n, Not):
            walk(n.child, not negated)
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c, negated)

    walk(node, False)
    return out
