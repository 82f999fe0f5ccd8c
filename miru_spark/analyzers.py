"""Per-locale analyzers — the reference's ``TermAnalyzers`` registry.

The reference maps locale → Lucene analyzer at field-definition time
(``miru-service/.../TermAnalyzers.java:45-133``: "en" → English
stemming, "zh"/"ja"/"ko" → CJK bigram analysis, fallback
StandardAnalyzer) and runs every ingested document and query string
through the field's analyzer. This module is the Spark-native
equivalent with one hard constraint the reference never had: every
analyzer must exist in THREE engines that agree token-for-token —

- a JVM ``Column`` expression (whole-stage codegen, the index build
  hot path — no Python in the loop),
- a pure-Python twin (query parser + pandas oracle),
- a DuckDB SQL fragment (the driver's oracle_sql twin),

so the driver can hash-compare analyzed output end-to-end. Lucene's
full stemmers are not portable to that contract (PorterStemmer has
hundreds of context rules), so the ``en`` analyzer implements the
*minimal* plural stemmer (the rule set of Lucene's
``EnglishMinimalStemFilter``: strip a final "s" from tokens of length
≥ 4 unless the preceding letter is s/u/i), which is deterministic,
regex-expressible, and covers the bulk of English term-conflation wins.

Analyzers:

- ``standard``  — lowercase, extract ``[a-z0-9']+`` runs (tokenize.py).
- ``whitespace``— split on whitespace, case-preserving (Lucene
  WhitespaceAnalyzer).
- ``en``        — standard + minimal plural stem.
- ``cjk``       — latin runs analyzed as ``standard``; CJK codepoint
  runs (Han, Hiragana, Katakana, Hangul) emitted as overlapping
  character bigrams, single-char runs as unigrams (Lucene
  CJKAnalyzer's bigram scheme). Token order: latin tokens first,
  then CJK bigrams in text order — identical in all three engines.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from miru_spark.tokenize import TOKEN_RE, tokenize_py, tokens_col

# CJK codepoint classes: Han, Hiragana, Katakana (+ phonetic ext), Hangul.
# Written as LITERAL characters (not \uXXXX escapes): Java regex, Python
# re, and DuckDB's RE2 all accept literal chars, while RE2 rejects \u.
_CJK_CLASS = "[一-鿿぀-ゟ゠-ヿㇰ-ㇿ가-힯]"
CJK_RUN_RE = f"{_CJK_CLASS}+"
_PY_CJK_RUN = re.compile(CJK_RUN_RE)

# Minimal plural stem: token length >= 4, ends in s, prior char not s/u/i
# (so 'class', 'status', 'analysis' survive; 'tables' -> 'table').
_STEM_RE = "^([a-z0-9']{2,}[^sui])s$"
_PY_STEM = re.compile(_STEM_RE)

WS_RUN_RE = "[^\\s]+"

# Bounded deterministic English stopword set — the reference gates a
# 1006-word Lucene list per field definition (EnStopwords.java;
# stopwords on/off in TermAnalyzers): the *mechanism* (filter analyzed
# tokens against a fixed set, identical in all three engines) is what
# matters; the set itself is a tunable constant.
EN_STOPWORDS = (
    "a an and are as at be but by for from has have he her his i in is it "
    "its me my no not of on or our she so that the their them they this to "
    "was we were will with you your"
).split()

# locale -> analyzer, the reference's TermAnalyzers map shape.
LOCALE_ANALYZERS: dict[str, str] = {
    "en": "en",
    "zh": "cjk",
    "ja": "cjk",
    "ko": "cjk",
}
DEFAULT_ANALYZER = "standard"


def analyzer_for_locale(locale: str | None) -> str:
    return LOCALE_ANALYZERS.get((locale or "").lower(), DEFAULT_ANALYZER)


# ---------------------------------------------------------------------------
# Spark Column implementations (JVM-side, codegen-friendly)
# ---------------------------------------------------------------------------


def _cjk_bigrams_col(text: Column) -> Column:
    """Overlapping bigrams over each CJK run (unigram for 1-char runs)."""
    runs = F.regexp_extract_all(text, F.lit(CJK_RUN_RE), F.lit(0))
    return F.flatten(
        F.transform(
            runs,
            lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.length(r) - 1),
                    lambda i: F.substring(r, i, F.lit(2)),
                )
            ),
        )
    )


def analyze_col(text: Column | str, analyzer: str = DEFAULT_ANALYZER) -> Column:
    """``array<string>`` of analyzed tokens (JVM column expression)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.coalesce(c, F.lit(""))  # NULL text -> [] in every engine
    if analyzer == "standard":
        return tokens_col(c)
    if analyzer == "whitespace":
        return F.regexp_extract_all(c, F.lit(WS_RUN_RE), F.lit(0))
    if analyzer == "en":
        return F.transform(
            tokens_col(c), lambda t: F.regexp_replace(t, _STEM_RE, "$1")
        )
    if analyzer == "cjk":
        return F.concat(tokens_col(c), _cjk_bigrams_col(c))
    if analyzer == "en_stop":
        return F.filter(
            analyze_col(c, "en"), lambda t: ~t.isin(list(EN_STOPWORDS))
        )
    raise ValueError(f"unknown analyzer: {analyzer!r}")


# ---------------------------------------------------------------------------
# Python twins (query parser / pandas oracle)
# ---------------------------------------------------------------------------


def _stem_py(tok: str) -> str:
    return _PY_STEM.sub(r"\1", tok)


def analyze_py(text: str | None, analyzer: str = DEFAULT_ANALYZER) -> list[str]:
    if text is None:
        return []
    if analyzer == "standard":
        return tokenize_py(text)
    if analyzer == "whitespace":
        return re.findall(WS_RUN_RE, text)
    if analyzer == "en":
        return [_stem_py(t) for t in tokenize_py(text)]
    if analyzer == "cjk":
        out = tokenize_py(text)
        for run in _PY_CJK_RUN.findall(text):
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        return out
    if analyzer == "en_stop":
        stop = set(EN_STOPWORDS)
        return [t for t in analyze_py(text, "en") if t not in stop]
    raise ValueError(f"unknown analyzer: {analyzer!r}")


def analyze_series(s: pd.Series, analyzer: str = DEFAULT_ANALYZER) -> pd.Series:
    """Vectorized-ish pandas twin (Arrow batch path)."""
    return s.map(lambda t: analyze_py(t, analyzer))


# ---------------------------------------------------------------------------
# DuckDB SQL fragments (driver oracle twins)
# ---------------------------------------------------------------------------

_DUCK_STD = "regexp_extract_all(lower({col}), '[a-z0-9'']+')"
_DUCK_STEM = (
    "list_transform(" + _DUCK_STD + ", t -> regexp_replace(t, "
    "'^([a-z0-9'']{{2,}}[^sui])s$', '\\1'))"
)
_DUCK_CJK = (
    "list_concat("
    + _DUCK_STD
    + ", flatten(list_transform("
    "regexp_extract_all({col}, '" + CJK_RUN_RE + "'), "
    "r -> CASE WHEN length(r) = 1 THEN [r] ELSE "
    "list_transform(range(1, length(r)), i -> substring(r, i, 2)) END)))"
)
_DUCK_WS = "regexp_extract_all({col}, '[^\\s]+')"


def duckdb_analyze(col: str, analyzer: str = DEFAULT_ANALYZER) -> str:
    """SQL fragment producing the identical token list in DuckDB."""
    frags = {
        "standard": _DUCK_STD,
        "whitespace": _DUCK_WS,
        "en": _DUCK_STEM,
        "cjk": _DUCK_CJK,
    }
    if analyzer == "en_stop":
        stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
        return (
            "list_filter(" + _DUCK_STEM.format(col=col) + f", x -> x NOT IN ({stop}))"
        )
    if analyzer not in frags:
        raise ValueError(f"unknown analyzer: {analyzer!r}")
    return frags[analyzer].format(col=col)
