"""Transcript corpus: schema, deterministic synthetic generator, and a
derivation from the driver's ``documents`` table.

Input shape (BASELINE.json ``input_hint``)::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

The synthetic generator mirrors the reference's e2e fixture style —
synthetic docs of N dictionary terms with term-frequency skew, written
through the real ingest path (enterstudio/miru
``miru-stream-plugins-test/.../fulltext/MiruFullTextNGTest.java:67-79,191-213``;
1M-doc harness ``MiruStreamServiceNGTest.java:113-155``) — but is
*distributed and counter-based*: every cell is a pure function of
(conv_id, turn_idx, seed) via splitmix64, so the corpus is identical at
any parallelism (local[8] == local[32] == a real cluster), which is what
lets the two-cluster-size bench compare throughput on the same input.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

ROLES = ["user", "assistant", "tool"]
TOOLS = ["bash", "search", "read", "write", "edit"]
VOCAB_SIZE = 10_000
ZIPF_S = 1.1
BASE_TS = np.datetime64("2024-01-01T00:00:00")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the deterministic counter-based RNG."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _zipf_cdf(vocab_size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    w = 1.0 / np.arange(1, vocab_size + 1, dtype=np.float64) ** s
    return np.cumsum(w) / w.sum()


_VOCAB = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])
_CDF = _zipf_cdf()


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 2_000,
    max_turns: int = 24,
    seed: int = 42,
    min_tokens: int = 5,
    max_tokens: int = 120,
    uniq_every: int = 50,
) -> DataFrame:
    """Distributed deterministic transcripts DataFrame.

    Conversation lengths, roles, tools, and Zipf-distributed token draws
    are all splitmix64(counter) functions — no RNG state, no driver-side
    materialization; scales to any n_convs by Spark range partitioning.
    """
    conv = spark.range(n_convs).select(
        F.col("id").alias("conv_i"),
        F.concat(F.lit("conv"), F.lpad(F.col("id").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
    )
    # turns per conv: 1 + h % max_turns (deterministic, contiguous 0..n-1)
    conv = conv.withColumn(
        "n_turns",
        (
            F.pmod(
                F.xxhash64(F.col("conv_i"), F.lit(seed)), F.lit(max_turns)
            )
            + 1
        ).cast("int"),
    )
    turns = conv.select(
        "conv_i",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    seed_ = seed
    min_t, max_t, uniq_n = min_tokens, max_tokens, uniq_every

    def gen_text(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab, cdf = _VOCAB, _CDF
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(role="", text="", tool=None)
                continue
            conv_i = pdf["conv_i"].to_numpy(np.uint64)
            turn = pdf["turn_idx"].to_numpy(np.uint64)
            # one global counter per turn for all derived draws
            base = _splitmix64(
                conv_i * np.uint64(1_000_003) + turn + np.uint64(seed_)
            )
            n_tok = (base % np.uint64(max_t - min_t + 1)).astype(np.int64) + min_t
            role_idx = (_splitmix64(base + np.uint64(1)) % np.uint64(10)).astype(
                np.int64
            )
            # 40/40/20 user/assistant/tool
            roles = np.where(
                role_idx < 4, "user", np.where(role_idx < 8, "assistant", "tool")
            )
            tool_draw = (_splitmix64(base + np.uint64(2)) % np.uint64(5)).astype(
                np.int64
            )
            tools = np.where(roles == "tool", np.array(TOOLS)[tool_draw], None)
            # token draws: counter = base*131 + j
            offs = np.zeros(len(pdf) + 1, dtype=np.int64)
            np.cumsum(n_tok, out=offs[1:])
            total = int(offs[-1])
            row_of = np.repeat(np.arange(len(pdf)), n_tok)
            j_of = np.arange(total, dtype=np.uint64) - offs[row_of].astype(np.uint64)
            tok_ctr = _splitmix64(
                base[row_of] * np.uint64(131) + j_of + np.uint64(7)
            )
            u = tok_ctr.astype(np.float64) / np.float64(2**64)
            tok_idx = np.searchsorted(cdf, u, side="left")
            words = vocab[np.clip(tok_idx, 0, len(vocab) - 1)]
            texts = []
            for r in range(len(pdf)):
                ws = words[offs[r] : offs[r + 1]]
                t = " ".join(ws)
                # rare unique token for exact-match tests
                g = int(conv_i[r]) * 1_000_003 + int(turn[r])
                if g % uniq_n == 0:
                    t = t + f" uniq{g}"
                texts.append(t)
            yield pd.DataFrame(
                {
                    "conv_i": pdf["conv_i"],
                    "turn_idx": pdf["turn_idx"],
                    "conv_id": pdf["conv_id"],
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                }
            )

    out = turns.mapInPandas(
        gen_text,
        schema="conv_i long, turn_idx int, conv_id string, role string, "
        "text string, tool string",
    )
    # ts monotonic in (conv_id, turn_idx): base + (conv_i*max_turns+turn)*1s
    out = out.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1704067200)  # 2024-01-01T00:00:00Z
            + F.col("conv_i") * F.lit(max_turns)
            + F.col("turn_idx")
        ),
    )
    return out.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


# ---------------------------------------------------------------------------
# Derivation from the driver's `documents` parquet — used by the
# __spark_entry__ oracle-checked queries so DuckDB can rebuild the exact
# same transcripts table in SQL.
# ---------------------------------------------------------------------------

TURNS_PER_CONV = 4

# DuckDB twin (documents view is pre-registered by the driver).
DUCKDB_TRANSCRIPTS = f"""
SELECT 'conv' || lpad((doc_id // {TURNS_PER_CONV})::VARCHAR, 8, '0') AS conv_id,
       (doc_id % {TURNS_PER_CONV})::INT AS turn_idx,
       CASE doc_id % 5 WHEN 0 THEN 'user' WHEN 3 THEN 'user'
                       WHEN 1 THEN 'assistant' WHEN 4 THEN 'assistant'
                       ELSE 'tool' END AS role,
       text,
       CASE WHEN doc_id % 5 = 2 THEN source ELSE NULL END AS tool,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts,
       ['g' || (doc_id % 7)::VARCHAR, 'g' || ((doc_id // 7) % 7)::VARCHAR] AS authz
FROM documents
"""


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SQL-expressible mapping documents → transcripts.

    doc_id is contiguous, so conv_id = doc_id // 4 groups each 4
    consecutive docs into one conversation with contiguous turn_idx —
    satisfying the docint-decomposition invariant (see docids.py).
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(
            F.lit("conv"),
            F.lpad((F.col("doc_id") / TURNS_PER_CONV).cast("long").cast("string"), 8, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % TURNS_PER_CONV).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 5 == 0, "user")
        .when(F.col("doc_id") % 5 == 3, "user")
        .when(F.col("doc_id") % 5 == 1, "assistant")
        .when(F.col("doc_id") % 5 == 4, "assistant")
        .otherwise("tool")
        .alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 2, F.col("source")).otherwise(None).alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("doc_id").cast("int"))
        ).alias("ts"),
        # per-doc authz groups (reference: per-activity authz String[],
        # MiruActivity authz + MiruAuthzExpression query side) — two
        # deterministic group labels so the DuckDB twin reproduces them
        F.array(
            F.concat(F.lit("g"), (F.col("doc_id") % 7).cast("string")),
            F.concat(
                F.lit("g"),
                ((F.col("doc_id") / 7).cast("long") % 7).cast("string"),
            ),
        ).alias("authz"),
    )
