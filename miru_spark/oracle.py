"""Pure-pandas reference oracle — no Spark.

Independent reimplementation of the engine semantics used by pytest to
assert rank-identical top-k (the pattern of the reference's
``RecoCorrectnessTest.java:259-314``, which cross-checks query answers
against independently maintained in-test structures — upgraded here from
sanity checks to exact golden comparison). Shares ONLY the tokenizer
function (tokenization equality is itself the contract under test).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

from miru_spark.query.ast import (
    DEFAULT_FIELD,
    And,
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
    positive_text_leaves,
)
from miru_spark.query.parser import parse_query
from miru_spark.tokenize import tokenize_py

K1 = 1.2
B = 0.75


def _levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance — independent of the engine's JVM
    ``levenshtein`` (that independence is the point of this module)."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class PandasIndex:
    def __init__(self, turns: pd.DataFrame):
        t = turns.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        t["docint"] = range(len(t))
        t["tokens"] = t["text"].map(tokenize_py)
        t["doclen"] = t["tokens"].map(len)
        self.docs = t
        self.n_docs = len(t)
        self.avgdl = float(t["doclen"].mean()) if len(t) else 0.0
        # term -> {docint: tf}
        self.post: dict[str, dict[int, int]] = {}
        for docint, toks in zip(t["docint"], t["tokens"]):
            for term, tf in Counter(toks).items():
                self.post.setdefault(term, {})[docint] = tf
        self.sorted_terms = sorted(self.post)

    # -- filter eval -------------------------------------------------------

    def _expand_prefix(self, p: str) -> list[str]:
        return [t for t in self.sorted_terms if t.startswith(p)]

    def _expand_leaf(self, leaf) -> list[str]:
        """Dictionary terms a text leaf matches (Lucene multi-term
        semantics, computed independently of ``expand_multiterm``)."""
        if isinstance(leaf, Term):
            return [leaf.value]
        if isinstance(leaf, Prefix):
            return self._expand_prefix(leaf.value)
        if isinstance(leaf, Wildcard):
            rx = re.compile(
                "".join(
                    ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                    for ch in leaf.pattern
                )
                + r"\Z"
            )
            return [t for t in self.sorted_terms if rx.match(t)]
        if isinstance(leaf, Regexp):
            rx = re.compile(f"(?:{leaf.pattern})\\Z")
            return [t for t in self.sorted_terms if rx.match(t)]
        if isinstance(leaf, Fuzzy):
            return [
                t
                for t in self.sorted_terms
                if abs(len(t) - len(leaf.value)) <= leaf.max_edits
                and _levenshtein(t, leaf.value) <= leaf.max_edits
            ]
        raise TypeError(leaf)

    def _phrase_docs(self, leaf: Phrase) -> set[int]:
        """Docs whose token stream contains the phrase: slop 0 = exact
        consecutive subsequence; slop N = terms in order within a window
        of ``len(terms) - 1 + N`` positions (the ``"a b"~N`` contract)."""
        terms = list(leaf.values)
        if not terms:
            return set()
        n = len(terms)
        window = n - 1 + leaf.slop
        out: set[int] = set()
        for docint, toks in zip(self.docs["docint"], self.docs["tokens"]):
            if leaf.slop == 0:
                if any(
                    toks[i : i + n] == terms for i in range(len(toks) - n + 1)
                ):
                    out.add(docint)
                continue
            for s, tok in enumerate(toks):
                if tok != terms[0]:
                    continue
                cur = s
                ok = True
                for t in terms[1:]:
                    nxt = next(
                        (
                            j
                            for j in range(cur + 1, min(len(toks), s + window + 1))
                            if toks[j] == t
                        ),
                        None,
                    )
                    if nxt is None:
                        ok = False
                        break
                    cur = nxt
                if ok:
                    out.add(docint)
                    break
        return out

    def _range_docs(self, leaf: Range) -> set[int]:
        col = self.docs[leaf.field]
        if leaf.field == "turn_idx":
            cast = int
        elif leaf.field == "ts":
            cast = pd.Timestamp
        else:
            cast = str
            col = col.astype("string")
        mask = pd.Series(True, index=self.docs.index)
        if leaf.lo is not None:
            lo = cast(leaf.lo)
            mask &= (col >= lo) if leaf.lo_inc else (col > lo)
        if leaf.hi is not None:
            hi = cast(leaf.hi)
            mask &= (col <= hi) if leaf.hi_inc else (col < hi)
        return set(self.docs.loc[mask.fillna(False), "docint"])

    def _leaf_set(self, leaf) -> set[int]:
        if leaf.field == DEFAULT_FIELD:
            s: set[int] = set()
            for t in self._expand_leaf(leaf):
                s.update(self.post.get(t, {}))
            return s
        col = self.docs[leaf.field].astype("string")
        if isinstance(leaf, Term):
            mask = col == leaf.value
        else:
            mask = col.str.startswith(leaf.value).fillna(False)
        return set(self.docs.loc[mask.fillna(False), "docint"])

    def eval_filter(self, node: Node) -> set[int]:
        if isinstance(node, Phrase):
            return self._phrase_docs(node)
        if isinstance(node, Range):
            return self._range_docs(node)
        if isinstance(node, (Term, Prefix, Wildcard, Regexp, Fuzzy)):
            return self._leaf_set(node)
        if isinstance(node, Or):
            out: set[int] = set()
            for c in node.children:
                out |= self.eval_filter(c)
            return out
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            if pos:
                base = self.eval_filter(pos[0])
                for c in pos[1:]:
                    base &= self.eval_filter(c)
            else:
                base = set(self.docs["docint"])
            for c in neg:
                base -= self.eval_filter(c)
            return base
        if isinstance(node, Not):
            return set(self.docs["docint"]) - self.eval_filter(node.child)
        raise TypeError(node)

    # -- scoring -----------------------------------------------------------

    def idf(self, term: str) -> float:
        df = len(self.post.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(
        self, query: str, k: int = 10, ts_lo=None, ts_hi=None, strategy: str = "bm25"
    ) -> pd.DataFrame:
        node = parse_query(query)
        matched = self.eval_filter(node)
        docs = self.docs
        if ts_lo is not None:
            matched &= set(docs.loc[docs["ts"] >= ts_lo, "docint"])
        if ts_hi is not None:
            matched &= set(docs.loc[docs["ts"] <= ts_hi, "docint"])

        if strategy == "time":
            top = sorted(matched, reverse=True)[:k]
            rows = docs[docs["docint"].isin(top)].copy()
            rows["score"] = 0.0
            rows = rows.sort_values("docint", ascending=False)
            return rows[["conv_id", "turn_idx", "docint", "score"]].reset_index(
                drop=True
            )

        leaves = positive_text_leaves(node)
        # per-term weight = idf·boost; a term matched by several leaves
        # scores ONCE at the MAX boosted weight (the postings predicate
        # selects rows, it doesn't multiply them)
        weights: dict[str, float] = {}
        for l in leaves:
            for t in self._expand_leaf(l):
                w = self.idf(t) * l.boost
                if w > weights.get(t, float("-inf")):
                    weights[t] = w
        scores: dict[int, float] = {}
        dl = dict(zip(docs["docint"], docs["doclen"]))
        for t in sorted(weights):
            plist = self.post.get(t)
            if not plist:
                continue
            w = weights[t]
            for d, tf in plist.items():
                if d not in matched:
                    continue
                denom = tf + K1 * (1 - B + B * dl[d] / self.avgdl)
                scores[d] = scores.get(d, 0.0) + w * tf * (K1 + 1) / denom
        if not weights:
            top = sorted(matched, reverse=True)[:k]
            scored = [(d, 0.0) for d in top]
        else:
            # every matched doc answers; unscored docs at 0 (FullText.java:139)
            scored = sorted(
                ((d, scores.get(d, 0.0)) for d in matched),
                key=lambda x: (-x[1], -x[0]),
            )[:k]
        meta = docs.set_index("docint")
        out = pd.DataFrame(
            [
                {
                    "conv_id": meta.at[d, "conv_id"],
                    "turn_idx": meta.at[d, "turn_idx"],
                    "docint": d,
                    "score": s,
                }
                for d, s in scored
            ],
            columns=["conv_id", "turn_idx", "docint", "score"],
        )
        return out
