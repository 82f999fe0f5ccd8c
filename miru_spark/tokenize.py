"""The engine's tokenizer — single source of truth for analysis.

Semantics follow the reference's ingest tokenizer (lowercase, split on
``[^a-zA-Z0-9']+``, drop empties — enterstudio/miru
``miru-stumptown-deployable/.../LogMill.java:79-91``; the query-side
tokenizer ``miru-plugin/.../query/TermTokenizer.java:34-54`` applies the
same analysis to query strings). We deliberately do NOT reproduce Lucene
per-locale stemming (``TermAnalyzers.java:45-133``): this engine defines
tokenization once and uses the identical function in the Spark build,
the query parser, the pure-pandas oracle, and the DuckDB oracle SQL.

The hot path is pure JVM column expressions (split/filter — whole-stage
codegen, no Python); a vectorized pandas variant exists for oracle /
offline use.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# One regex, three engines. Java (Spark), Python (oracle), DuckDB SQL.
# Extraction form ("match tokens") rather than split form ("split on
# non-tokens"): regexp_extract_all is whole-stage-codegen'd in Spark,
# while split + a higher-order filter lambda is CodegenFallback and ~10x
# slower per token. The two forms are equivalent (tested).
TOKEN_RE = "[a-z0-9']+"
_PY_TOKEN = re.compile(TOKEN_RE)

# DuckDB-side equivalent used inside oracle_sql() strings.
DUCKDB_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9'']+')"


def tokens_col(text: Column | str) -> Column:
    """``array<string>`` of analyzed tokens for a text column (JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), F.lit(0))


def tokenize_py(text: str | None) -> list[str]:
    """Python twin of :func:`tokens_col` (used by the pandas oracle)."""
    if text is None:
        return []
    return _PY_TOKEN.findall(text.lower())


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas twin (Arrow batch path)."""
    return s.fillna("").str.lower().str.findall(TOKEN_RE)
