"""The Arrow-batched tokenizer (postings_flat_pandas) must agree with
the JVM explode+groupBy path posting-for-posting — same (term, docint)
set, same tf/doclen, and ascending in-doc positions identical to the
posexplode order."""

from __future__ import annotations

import pytest

from miru_spark.indexing.build import (
    base_with_docint,
    postings_flat,
    postings_flat_pandas,
)


def _collect(df, positions: bool):
    key = lambda r: (r["term"], r["docint"])  # noqa: E731
    out = {}
    for r in df.collect():
        val = (r["tf"], r["doclen"], list(r["positions"]) if positions else None)
        out[key(r)] = val
    return out


@pytest.mark.parametrize("analyzer", ["standard", "en", "ru", "cjk"])
@pytest.mark.parametrize("positions", [True, False])
def test_pandas_tokenizer_matches_jvm(spark, tiny_turns, analyzer, positions):
    base = base_with_docint(tiny_turns).cache()
    jvm = _collect(
        postings_flat(base, positions=positions, analyzer=analyzer), positions
    )
    pnd = _collect(
        postings_flat_pandas(base, positions=positions, analyzer=analyzer),
        positions,
    )
    assert pnd == jvm
    assert len(jvm) > 0


def test_pandas_tokenizer_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "only real tokens here"), (3, "—…—")],
        "docint long, text string",
    )
    rows = postings_flat_pandas(df, positions=True).collect()
    assert {r["docint"] for r in rows} == {2}
    got = {r["term"]: (r["tf"], list(r["positions"])) for r in rows}
    assert got == {
        "only": (1, [0]),
        "real": (1, [1]),
        "tokens": (1, [2]),
        "here": (1, [3]),
    }
