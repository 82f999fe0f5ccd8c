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
from collections import Counter

import pandas as pd

from miru_spark.query.ast import (
    DEFAULT_FIELD,
    And,
    Node,
    Not,
    Or,
    Prefix,
    Term,
    positive_text_leaves,
)
from miru_spark.query.parser import parse_query
from miru_spark.tokenize import tokenize_py

K1 = 1.2
B = 0.75


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

    def _leaf_set(self, leaf) -> set[int]:
        if leaf.field == DEFAULT_FIELD:
            terms = (
                [leaf.value]
                if isinstance(leaf, Term)
                else self._expand_prefix(leaf.value)
            )
            s: set[int] = set()
            for t in terms:
                s.update(self.post.get(t, {}))
            return s
        col = self.docs[leaf.field].astype("string")
        if isinstance(leaf, Term):
            mask = col == leaf.value
        else:
            mask = col.str.startswith(leaf.value).fillna(False)
        return set(self.docs.loc[mask.fillna(False), "docint"])

    def eval_filter(self, node: Node) -> set[int]:
        if isinstance(node, (Term, Prefix)):
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
        terms: set[str] = set()
        for l in leaves:
            if isinstance(l, Term):
                terms.add(l.value)
            else:
                terms.update(self._expand_prefix(l.value))
        scores: dict[int, float] = {}
        dl = dict(zip(docs["docint"], docs["doclen"]))
        for t in sorted(terms):
            plist = self.post.get(t)
            if not plist:
                continue
            w = self.idf(t)
            for d, tf in plist.items():
                if d not in matched:
                    continue
                denom = tf + K1 * (1 - B + B * dl[d] / self.avgdl)
                scores[d] = scores.get(d, 0.0) + w * tf * (K1 + 1) / denom
        if not terms:
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
