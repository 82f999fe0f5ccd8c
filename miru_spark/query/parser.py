"""Lucene-style query-string parser.

Grammar parity with the reference's ``LuceneBackedQueryParser``
(``miru-plugin/.../query/LuceneBackedQueryParser.java:47-144``): only
TermQuery, PrefixQuery and BooleanQuery are supported (:94-108), with
``AND`` default between bare terms (the reference parser is constructed
default-AND), ``OR``, ``NOT`` (mapped to pButNotQ, :117-136),
``field:value``, trailing ``*`` prefix, and parentheses. Term text is run
through the same analyzer as indexing (reference ``TermTokenizer``
applies the analyzer to query strings, ``TermTokenizer.java:34-54``) — a
query token that analyzes to several terms becomes an AND of them.
"""

from __future__ import annotations

import re

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
from miru_spark.tokenize import tokenize_py

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<quoted>[+-]?"[^"]*"(?:~[0-9]+)?(?:\^[0-9.]+)?)
      | (?P<word>[^\s()]+)
    )""",
    re.VERBOSE,
)

METADATA_FIELDS = {"role", "tool", "conv_id"}
# fields supporting [lo TO hi] / {lo TO hi} / >x >=x <x <=x range syntax
# (typed columns — see ast.Range for the reference numeric-term analog)
RANGE_FIELDS = {"turn_idx", "ts", "conv_id"}
AUTHZ_FIELD = "authz"


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[str]:
    toks, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            break
        i = m.end()
        toks.append(
            m.group("lparen")
            or m.group("rparen")
            or m.group("quoted")
            or m.group("word")
        )
    return toks


class _Parser:
    def __init__(self, toks: list[str], analyzer: str = "standard"):
        self.toks = toks
        self.i = 0
        self.analyzer = analyzer

    def _pretok(self, s: str) -> list[str]:
        """Pre-split a text-field value with the index analyzer's
        tokenizer+normalizer (no stemming — ``analyze_node`` stems each
        leaf exactly once afterwards). For ``standard`` this is exactly
        ``tokenize_py``; for non-latin analyzers it keeps the scripts
        the LogMill regex would silently drop (a ru query for 'лисы'
        must reach the ru stemmer, not die here)."""
        if self.analyzer == "standard":
            return tokenize_py(s)
        from miru_spark.analyzers import pretokenize_py

        return pretokenize_py(s, self.analyzer)

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_or(self) -> Node:
        left = [self.parse_and()]
        while self.peek() == "OR":
            self.next()
            left.append(self.parse_and())
        return left[0] if len(left) == 1 else Or(tuple(left))

    def parse_and(self) -> Node:
        children = [self.parse_unary()]
        while True:
            t = self.peek()
            if t is None or t in ("OR", ")"):
                break
            if t == "AND":
                self.next()
                continue
            children.append(self.parse_unary())
        if len(children) == 1 and not isinstance(children[0], Not):
            return children[0]
        return And(tuple(children))

    def parse_unary(self) -> Node:
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        if t in ("NOT", "-"):
            self.next()
            return Not(self.parse_unary())
        if t == "+":
            # bare MUST marker (the lexer splits '+(' into '+', '(')
            self.next()
            return self.parse_unary()
        if t.startswith("-") and len(t) > 1:
            # Lucene MUST_NOT sugar: '-term' == NOT term. The lexer emits
            # '-term' as one word token, so strip the dash here instead of
            # silently matching the positive term.
            self.toks[self.i] = t[1:]
            return Not(self.parse_atom())
        if t.startswith("+") and len(t) > 1:
            # Lucene MUST sugar: under this parser's default-AND
            # conjunction (reference LuceneBackedQueryParser is
            # constructed default-AND) every bare clause is already
            # required, so '+clause' == clause. Strip the marker so
            # '+role:assistant' keeps its field meaning instead of
            # degrading to a text search for 'role assistant'.
            self.toks[self.i] = t[1:]
            return self.parse_unary()
        return self.parse_atom()

    def parse_atom(self) -> Node:
        t = self.next()
        if t == "(":
            node = self.parse_or()
            if self.peek() != ")":
                raise QueryParseError("missing )")
            self.next()
            return node
        if t == ")":
            raise QueryParseError("unexpected )")
        if t in ("AND", "OR", "NOT"):
            raise QueryParseError(f"operator {t} in term position")
        if t.startswith('"') and ('"' in t[1:]):
            # quoted positional phrase, optional ~N slop and ^B boost
            # suffixes (needs a positions index to serve; a 1-term
            # phrase degrades to the plain term)
            body, _, suffix = t[1:].rpartition('"')
            sm = re.fullmatch(r"(?:~([0-9]+))?(?:\^([0-9.]+))?", suffix)
            if sm is None:
                raise QueryParseError(f"bad phrase suffix: {t!r}")
            slop = int(sm.group(1) or 0)
            boost = float(sm.group(2) or 1.0)
            parts = self._pretok(body)
            if not parts:
                raise QueryParseError(f"phrase analyzes to nothing: {t!r}")
            if len(parts) == 1:
                return Term(parts[0], boost=boost)
            return Phrase(tuple(parts), slop=slop, boost=boost)
        if t.endswith(":") and self.peek() == "(":
            # field grouping, Lucene 'field:(a OR b)': parse the group,
            # then retarget its text leaves at the field
            f = t[:-1]
            if not (
                f in METADATA_FIELDS or f in RANGE_FIELDS or f == DEFAULT_FIELD
            ):
                raise QueryParseError(f"unknown group field: {f!r}")
            self.next()
            node = self.parse_or()
            if self.peek() != ")":
                raise QueryParseError("missing ) after field group")
            self.next()
            return _retarget(node, f)
        field = DEFAULT_FIELD
        if ":" in t:
            f, _, rest = t.partition(":")
            if (
                f in METADATA_FIELDS
                or f in RANGE_FIELDS
                or f == AUTHZ_FIELD
                or f == DEFAULT_FIELD
            ):
                field, t = f, rest
        if field == AUTHZ_FIELD:
            # MiruAuthzExpression: comma-separated any-of values
            vals = tuple(v for v in t.split(",") if v)
            if not vals:
                raise QueryParseError("authz: needs at least one value")
            return AuthzAny(vals)
        if field in RANGE_FIELDS or field == DEFAULT_FIELD:
            # text:[lo TO hi] = numeric-token term range (the reference's
            # numeric-lex term scan, MiruTermComposer.java:35-119);
            # typed-field ranges stay plain column predicates
            rng = self._maybe_range(field, t)
            if rng is not None:
                return rng
        boost = 1.0
        if field == DEFAULT_FIELD:
            # Lucene '^B' clause boost — suffix comes after any fuzzy/
            # wildcard marker ('spark~1^2', 'fo*bar^0.5')
            bm = re.fullmatch(r"(.+?)\^([0-9]+(?:\.[0-9]+)?)", t)
            if bm:
                t, boost = bm.group(1), float(bm.group(2))
            # regexp: /pattern/ (Lucene RegexpQuery; anchored match of
            # a whole dictionary term; patterns with spaces or parens
            # are beyond this lexer)
            if t.startswith("/") and t.endswith("/") and len(t) > 2:
                return Regexp(t[1:-1], boost=boost)
            # fuzzy: word~ (2 edits, Lucene default) or word~N
            m = re.fullmatch(r"([^~]+)~([0-9]?)", t)
            if m and not any(ch in m.group(1) for ch in "*?"):
                parts = self._pretok(m.group(1))
                if len(parts) != 1:
                    raise QueryParseError(f"fuzzy needs one term: {t!r}")
                return Fuzzy(parts[0], int(m.group(2) or 2), boost=boost)
            # wildcard: '?' anywhere or '*' beyond a single trailing one
            # (which stays the cheaper Prefix); reject all-wildcard
            if ("?" in t) or ("*" in t[:-1]) or t.count("*") > 1:
                if not t.strip("*?"):
                    raise QueryParseError(f"wildcard matches everything: {t!r}")
                return Wildcard(t.lower(), boost=boost)
        is_prefix = t.endswith("*") and len(t) > 1
        if is_prefix:
            t = t[:-1]
        if field == DEFAULT_FIELD:
            # analyze like indexed text; multi-token value => AND of terms
            parts = self._pretok(t)
            if not parts:
                raise QueryParseError(f"term analyzes to nothing: {t!r}")
            if is_prefix:
                leaves = [Term(p, boost=boost) for p in parts[:-1]] + [
                    Prefix(parts[-1], boost=boost)
                ]
            else:
                leaves = [Term(p, boost=boost) for p in parts]
            return leaves[0] if len(leaves) == 1 else And(tuple(leaves))
        return Prefix(t, field) if is_prefix else Term(t, field)

    def _maybe_range(self, field: str, t: str) -> Range | None:
        """``[lo TO hi]`` / ``{lo TO hi}`` bracket ranges (the value may
        span lexer tokens — timestamps contain spaces) and the
        ``>v >=v <v <=v`` comparison sugar. Returns None for a plain
        exact value."""
        if t.startswith(("[", "{")):
            parts = [t]
            while not parts[-1].endswith(("]", "}")):
                nxt = self.peek()
                if nxt is None:
                    raise QueryParseError(f"unterminated range on {field}")
                parts.append(self.next())
            s = " ".join(parts)
            lo_inc, hi_inc = s[0] == "[", s[-1] == "]"
            body = s[1:-1]
            if " TO " not in body:
                raise QueryParseError(f"range needs 'TO': {s!r}")
            lo, _, hi = body.partition(" TO ")
            lo, hi = lo.strip(), hi.strip()
            return Range(
                field,
                None if lo in ("", "*") else lo,
                None if hi in ("", "*") else hi,
                lo_inc,
                hi_inc,
            )
        for op, kw in ((">=", dict(lo_inc=True)), (">", dict(lo_inc=False))):
            if t.startswith(op) and len(t) > len(op):
                return Range(field, lo=t[len(op):], hi=None, **kw)
        for op, kw in (("<=", dict(hi_inc=True)), ("<", dict(hi_inc=False))):
            if t.startswith(op) and len(t) > len(op):
                return Range(field, lo=None, hi=t[len(op):], **kw)
        return None


def _retarget(node: Node, field: str) -> Node:
    """Point a field group's text leaves at ``field`` (Term/Prefix/
    Wildcard/Fuzzy; boolean structure passes through; anything else —
    phrases, ranges, nested groups — has no metadata meaning)."""
    from dataclasses import replace

    if isinstance(node, (Term, Prefix, Wildcard, Fuzzy, Regexp)):
        if node.field != DEFAULT_FIELD:
            raise QueryParseError(f"nested field inside group: {node!r}")
        return replace(node, field=field)
    if isinstance(node, Not):
        return Not(_retarget(node.child, field))
    if isinstance(node, And):
        return And(tuple(_retarget(c, field) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(_retarget(c, field) for c in node.children))
    raise QueryParseError(f"unsupported node in field group: {node!r}")


def analyze_node(node: Node, analyzer: str = "standard") -> Node:
    """Run text-field Term/Phrase leaves through the index's analyzer —
    the reference analyzes every query string with the field's analyzer
    (``TermTokenizer.java:34-54`` via ``TermAnalyzers.findAnalyzer``), so
    a stemmed index must stem its queries too ('joins' must hit an
    ``en`` index's 'join' postings).

    Lucene parity for the edges: multi-term expansions (a CJK term
    analyzing to bigrams) become And(...) for Terms and expand in place
    inside Phrases; Prefix/Wildcard/Fuzzy/Regexp patterns BYPASS
    analysis (Lucene multi-term queries are not analyzed); metadata
    fields (role:, tool:) are keyword fields and pass through; a term
    or phrase that analyzes to nothing (pure stopword under a ``_stop``
    analyzer) DROPS its clause — Lucene's ``QueryBuilder`` returns null
    for an empty token stream and the enclosing BooleanQuery omits the
    clause, so ``the AND batch`` means ``batch``, not an impossible
    conjunction. A query that analyzes to nothing entirely raises
    ``QueryParseError``.

    NOT idempotent for suffix stemmers — apply exactly once per query
    string, which ``parse_query(q, analyzer=...)`` guarantees.
    """
    if analyzer == "standard":
        return node
    from dataclasses import replace as _replace

    from miru_spark.analyzers import analyze_py
    from miru_spark.query.ast import And, Not, Or, Phrase, Term

    def go(n: Node) -> Node | None:
        if isinstance(n, Term) and n.field == DEFAULT_FIELD:
            out = analyze_py(n.value, analyzer)
            if not out:
                return None  # empty token stream → clause dropped
            if len(out) == 1:
                return _replace(n, value=out[0])
            return And(tuple(_replace(n, value=v) for v in out))
        if isinstance(n, Phrase) and n.field == DEFAULT_FIELD:
            vals: list[str] = []
            for v in n.values:
                vals.extend(analyze_py(v, analyzer))
            return _replace(n, values=tuple(vals)) if vals else None
        if isinstance(n, (And, Or)):
            kids = [k for k in (go(c) for c in n.children) if k is not None]
            if not kids:
                return None
            if len(kids) == 1:
                return kids[0]
            return type(n)(tuple(kids))
        if isinstance(n, Not):
            c = go(n.child)
            return None if c is None else Not(c)
        return n

    out = go(node)
    if out is None:
        raise QueryParseError("query analyzes to nothing")
    return out


def parse_query(q: str, analyzer: str = "standard") -> Node:
    toks = _lex(q)
    if not toks:
        raise QueryParseError("empty query")
    p = _Parser(toks, analyzer)
    node = p.parse_or()
    if p.peek() is not None:
        raise QueryParseError(f"trailing tokens at {p.i}")
    return analyze_node(node, analyzer)
