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
- ``en``        — standard + minimal plural stem
  (EnglishMinimalStemFilter's rule set).
- ``fr/de/es/it/pt`` — accent-aware latin tokenizer (``[a-z0-9'ß-öø-ÿ]+``
  over lowercased text) + a single-pass minimal suffix stemmer per
  language, approximating Lucene's ``*MinimalStemFilter`` family
  (FrenchMinimalStemFilter, GermanMinimalStemFilter,
  PortugueseMinimalStemmer, ItalianLightStemmer's final-vowel rule)
  with ONE regex rule each so all three engines agree exactly.
- ``cjk``       — latin runs analyzed as ``standard``; CJK codepoint
  runs (Han, Hiragana, Katakana, Hangul) emitted as overlapping
  character bigrams, single-char runs as unigrams (Lucene
  CJKAnalyzer's bigram scheme). Token order: latin tokens first,
  then CJK bigrams in text order — identical in all three engines.
- ``<base>_stop`` — any analyzer with a stopword set in STOPWORDS,
  filtered (the reference's useStopWords toggle,
  TermAnalyzers.findAnalyzer).

Locale resolution follows the reference's ``findAnalyzer`` exactly:
try the full code, then walk prefixes before the first ``_``
(``pt_BR`` → ``pt_br`` → ``pt``), falling back to ``standard``.
Honest gap vs the reference: ~30 Lucene analyzers with full snowball
stemmers vs 11 locale mappings over 5 minimal stemmers here — breadth
is bounded by the three-engine-parity contract, not by the mechanism.
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

# Accent-aware latin char class for the European analyzers, written as
# literal latin-1 ranges (ß-ö = U+00DF-U+00F6, ø-ÿ = U+00F8-U+00FF,
# skipping ÷) — Java regex, Python re, and DuckDB RE2 all accept them.
_L = "a-z0-9'ß-öø-ÿ"
LATIN_TOKEN_RE = f"[{_L}]+"
_PY_LATIN = re.compile(LATIN_TOKEN_RE)

# Per-language single-pass minimal suffix stemmers (ONE regex rule each;
# replacement is group 1). Greedy stem group ⇒ the SHORTEST matching
# suffix is stripped — deterministic and identical under Java regex,
# Python re, and RE2. Approximations of Lucene's *MinimalStemFilter*
# rule sets, scoped to plural/final-vowel conflation:
#   fr  plural -s/-x, stem >= 3, prior char not s/u/i/x
#   de  plural/inflection -en/-er/-es/-e/-s/-n, stem >= 3
#   es  plural -es/-s, stem >= 3
#   pt  plural -es/-s, stem >= 3
#   it  final vowel -o/-a/-e/-i, stem >= 3
_MIN_STEMS: dict[str, str] = {
    "en": _STEM_RE,
    "fr": f"^([{_L}]{{2,}}[^suix])[sx]$",
    "de": f"^([{_L}]{{3,}})(?:en|er|es|e|s|n)$",
    "es": f"^([{_L}]{{3,}})(?:es|s)$",
    "pt": f"^([{_L}]{{3,}})(?:es|s)$",
    "it": f"^([{_L}]{{3,}})[oaei]$",
}
_PY_MIN_STEMS = {k: re.compile(v) for k, v in _MIN_STEMS.items()}
# analyzers whose token stream is the accent-aware latin tokenizer
_LATIN_ANALYZERS = frozenset(_MIN_STEMS) - {"en"}

WS_RUN_RE = "[^\\s]+"

# Bounded deterministic per-locale stopword sets — the reference gates a
# 1006-word Lucene list per field definition (EnStopwords.java;
# stopwords on/off via TermAnalyzers.findAnalyzer(useStopWords)): the
# *mechanism* (filter analyzed tokens against a fixed set, identical in
# all three engines) is what matters; each set is a tunable constant.
# Entries are ASCII-only function words in their POST-STEM surface form
# (the filter runs after stemming, as Lucene's stop filter runs inside
# the analyzer chain).
EN_STOPWORDS = (
    "a an and are as at be but by for from has have he her his i in is it "
    "its me my no not of on or our she so that the their them they this to "
    "was we were will with you your"
).split()

STOPWORDS: dict[str, list[str]] = {
    "en": EN_STOPWORDS,
    # e.g. fr 'dans'→'dan', 'sans'→'san' ('les'/'pas' are too short to
    # stem and appear in surface form)
    "fr": (
        "le la les un une des de du et ou mais dan sur pour par avec san "
        "que qui ne pas plus est sont il elle ils nous vous je tu se sa "
        "son ses au aux ce cette ces"
    ).split(),
    # e.g. de 'eine'→'ein', 'einen'/'eines'→'eine', 'ohne'→'ohn',
    # 'dass'→'das', 'sein'→'sei', 'haben'→'habe'
    "de": (
        "der die das den dem des ein eine einem und oder aber in auf für "
        "von mit ohn wer was nicht mehr ist sind sei habe er sie es wir "
        "ihr ich du sich"
    ).split(),
    # e.g. es 'unas'→'una', 'unos'→'uno', 'ellos'→'ello', 'estos'→'esto'
    "es": (
        "el la los las un una uno de del y o pero en sobre para por con "
        "sin que quien no es son ser estar tiene ella ello yo se su sus "
        "al este esta esto"
    ).split(),
    # e.g. it 'senza'→'senz', 'sono'→'son', 'questo/questa'→'quest'
    "it": (
        "il lo la i gli le un una uno di del e o ma in su per da con senz "
        "che chi non son esser aver lui lei lor noi voi io tu si suo sua "
        "al quest"
    ).split(),
    # e.g. pt 'umas'→'uma', 'eles'→'ele' ('não' keeps its accent — the
    # latin tokenizer preserves it)
    "pt": (
        "o a os as um uma uns de do da dos das e ou mas em sobre para por "
        "com sem que quem nao não ser estar tem ele ela eu tu se seu sua "
        "ao este esta"
    ).split(),
}

# locale -> analyzer, the reference's TermAnalyzers map shape
# (TermAnalyzers.java:57-99; only parity-provable analyzers registered).
LOCALE_ANALYZERS: dict[str, str] = {
    "en": "en",
    "en_ie": "en",
    "fr": "fr",
    "de": "de",
    "es": "es",
    "it": "it",
    "pt": "pt",
    "pt_br": "pt",
    "zh": "cjk",
    "ja": "cjk",
    "ko": "cjk",
}
DEFAULT_ANALYZER = "standard"


def analyzer_for_locale(locale: str | None, use_stopwords: bool = False) -> str:
    """Resolve locale → analyzer name, walking ``_``-prefixes exactly
    like the reference (TermAnalyzers.findAnalyzer:121-133): full code
    first, then the prefix before the first ``_`` (``pt_BR`` → ``pt``).
    ``use_stopwords`` returns the ``_stop`` variant when the resolved
    analyzer has a stopword set (the reference's useStopWords flag)."""
    code = (locale or "").lower().replace("-", "_")
    a = LOCALE_ANALYZERS.get(code)
    while a is None:
        ix = code.find("_")
        if ix == -1:
            break
        code = code[:ix]
        a = LOCALE_ANALYZERS.get(code)
    if a is None:
        a = DEFAULT_ANALYZER
    if use_stopwords and a in STOPWORDS:
        return f"{a}_stop"
    return a


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
    if analyzer.endswith("_stop"):
        base = analyzer[: -len("_stop")]
        if base not in STOPWORDS:
            raise ValueError(f"no stopword set for analyzer: {base!r}")
        return F.filter(
            analyze_col(c, base), lambda t: ~t.isin(list(STOPWORDS[base]))
        )
    if analyzer == "standard":
        return tokens_col(c)
    if analyzer == "whitespace":
        return F.regexp_extract_all(c, F.lit(WS_RUN_RE), F.lit(0))
    if analyzer == "cjk":
        return F.concat(tokens_col(c), _cjk_bigrams_col(c))
    if analyzer in _MIN_STEMS:
        toks = (
            F.regexp_extract_all(F.lower(c), F.lit(LATIN_TOKEN_RE), F.lit(0))
            if analyzer in _LATIN_ANALYZERS
            else tokens_col(c)
        )
        return F.transform(
            toks, lambda t: F.regexp_replace(t, _MIN_STEMS[analyzer], "$1")
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
    if analyzer.endswith("_stop"):
        base = analyzer[: -len("_stop")]
        if base not in STOPWORDS:
            raise ValueError(f"no stopword set for analyzer: {base!r}")
        stop = set(STOPWORDS[base])
        return [t for t in analyze_py(text, base) if t not in stop]
    if analyzer == "standard":
        return tokenize_py(text)
    if analyzer == "whitespace":
        return re.findall(WS_RUN_RE, text)
    if analyzer == "cjk":
        out = tokenize_py(text)
        for run in _PY_CJK_RUN.findall(text):
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        return out
    if analyzer in _MIN_STEMS:
        toks = (
            _PY_LATIN.findall(text.lower())
            if analyzer in _LATIN_ANALYZERS
            else tokenize_py(text)
        )
        stem = _PY_MIN_STEMS[analyzer]
        return [stem.sub(r"\1", t) for t in toks]
    raise ValueError(f"unknown analyzer: {analyzer!r}")


def analyze_series(s: pd.Series, analyzer: str = DEFAULT_ANALYZER) -> pd.Series:
    """Vectorized-ish pandas twin (Arrow batch path)."""
    return s.map(lambda t: analyze_py(t, analyzer))


# ---------------------------------------------------------------------------
# DuckDB SQL fragments (driver oracle twins)
# ---------------------------------------------------------------------------

_DUCK_STD = "regexp_extract_all(lower({col}), '[a-z0-9'']+')"
_DUCK_LATIN = (
    "regexp_extract_all(lower({col}), '" + LATIN_TOKEN_RE.replace("'", "''") + "')"
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


def _duck_stem(analyzer: str) -> str:
    """list_transform stemmer fragment over the analyzer's tokenizer."""
    toks = _DUCK_LATIN if analyzer in _LATIN_ANALYZERS else _DUCK_STD
    # regex literals: '' for the quote inside the char class; {{ }} so
    # str.format leaves the quantifier braces alone
    stem = _MIN_STEMS[analyzer].replace("'", "''").replace("{", "{{").replace("}", "}}")
    return "list_transform(" + toks + f", t -> regexp_replace(t, '{stem}', '\\1'))"


def duckdb_analyze(col: str, analyzer: str = DEFAULT_ANALYZER) -> str:
    """SQL fragment producing the identical token list in DuckDB."""
    if analyzer.endswith("_stop"):
        base = analyzer[: -len("_stop")]
        if base not in STOPWORDS:
            raise ValueError(f"no stopword set for analyzer: {base!r}")
        stop = ", ".join(f"'{w}'" for w in STOPWORDS[base])
        return (
            "list_filter("
            + duckdb_analyze(col, base)
            + f", x -> x NOT IN ({stop}))"
        )
    frags = {
        "standard": _DUCK_STD,
        "whitespace": _DUCK_WS,
        "cjk": _DUCK_CJK,
    }
    if analyzer in _MIN_STEMS:
        return _duck_stem(analyzer).format(col=col)
    if analyzer not in frags:
        raise ValueError(f"unknown analyzer: {analyzer!r}")
    return frags[analyzer].format(col=col)
