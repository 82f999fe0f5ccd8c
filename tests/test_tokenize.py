"""Tokenizer contract: Spark column expr == Python == pandas — the
single-analyzer invariant (SURVEY.md §2.8; reference LogMill.java:79-91)."""

import pandas as pd
from pyspark.sql import functions as F

from miru_spark.tokenize import tokenize_py, tokenize_series, tokens_col

CASES = [
    "Hello, World!",
    "foo_bar baz-qux",
    "it's a don't-stop 'quoted'",
    "  leading and trailing  ",
    "",
    "UPPER lower 123 mix3d",
    "unicode café naïve",  # non-ascii letters are separators by design
    "a;b.c/d\\e|f",
    "tabs\tand\nnewlines",
]


def test_python_vs_pandas():
    s = pd.Series(CASES)
    assert list(tokenize_series(s)) == [tokenize_py(c) for c in CASES]


def test_python_vs_spark(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    got = [r[0] for r in df.select(tokens_col("text")).collect()]
    assert got == [tokenize_py(c) for c in CASES]


def test_none_handling():
    assert tokenize_py(None) == []
    assert list(tokenize_series(pd.Series([None]))) == [[]]


def test_corpus_equality(spark, tiny_turns, tiny_pdf):
    """Per-turn tokenization equality over the whole tiny corpus."""
    got = (
        tiny_turns.select("conv_id", "turn_idx", tokens_col("text").alias("tk"))
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    exp = tiny_pdf.sort_values(["conv_id", "turn_idx"])
    for row, (_, erow) in zip(got, exp.iterrows()):
        assert row["tk"] == tokenize_py(erow["text"])


def test_fuzzed_parity():
    """Property-based parity of the pure-Python and pandas tokenizers
    over arbitrary unicode (hypothesis), including surrogates-adjacent
    text, control chars and long runs of separators."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def check(s):
        assert list(tokenize_series(pd.Series([s])))[0] == tokenize_py(s)

    check()


def test_fuzzed_spark_parity(spark):
    """Seeded 200-string random batch through the Spark column
    expression in ONE job, compared against tokenize_py row-by-row."""
    import random
    import string

    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + "'-_.,;:!?/\\|()[]{} \t\n" + "éüß漢字"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, text string")
    got = {r["i"]: r["tk"] for r in df.select("i", tokens_col("text").alias("tk")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == tokenize_py(c), repr(c)
