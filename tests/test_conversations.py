"""Conversation analytics + PII scrubbing vs pure-pandas twins."""

from __future__ import annotations

import re

from miru_spark.tokenize import tokenize_py


def test_conversation_stats_vs_pandas(tiny_turns, tiny_pdf):
    from miru_spark.operators.conversations import conversation_stats

    got = {
        r["conv_id"]: r.asDict()
        for r in conversation_stats(tiny_turns).collect()
    }
    assert len(got) == tiny_pdf["conv_id"].nunique()
    for conv_id, g in tiny_pdf.groupby("conv_id"):
        e = got[conv_id]
        assert e["n_turns"] == len(g)
        assert e["n_user"] == int((g["role"] == "user").sum())
        assert e["n_assistant"] == int((g["role"] == "assistant").sum())
        assert e["n_tool_calls"] == int(g["tool"].notna().sum())
        assert e["total_tokens"] == int(
            g["text"].map(lambda t: len(tokenize_py(t))).sum()
        )
        dur = (g["ts"].max() - g["ts"].min()).total_seconds()
        assert e["duration_s"] == int(dur)
        first_role = g.sort_values("turn_idx")["role"].iloc[0]
        valid = (
            first_role == "user"
            and g["turn_idx"].min() == 0
            and g["turn_idx"].max() + 1 == len(g)
            and g["turn_idx"].nunique() == len(g)
        )
        assert e["is_valid"] == valid


def test_role_transitions_vs_pandas(tiny_turns, tiny_pdf):
    from collections import Counter

    from miru_spark.operators.conversations import role_transitions

    got = {
        (r["from_role"], r["to_role"]): r["n"]
        for r in role_transitions(tiny_turns).collect()
    }
    expect: Counter = Counter()
    for _, g in tiny_pdf.groupby("conv_id"):
        roles = g.sort_values("turn_idx")["role"].tolist()
        for a, b in zip(roles, roles[1:]):
            expect[(a, b)] += 1
    assert got == dict(expect)


def test_context_windows_vs_pandas(tiny_turns, tiny_pdf):
    from miru_spark.operators.conversations import context_windows

    k, sep = 3, "\n"
    got = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["target"])
        for r in context_windows(tiny_turns, k=k, sep=sep).collect()
    }
    n_expected = 0
    for conv_id, g in tiny_pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx").reset_index(drop=True)
        for i, row in g.iterrows():
            if row["role"] != "assistant":
                continue
            n_expected += 1
            prev = g.iloc[max(0, i - k) : i]
            ctx = (
                sep.join(f"{r.role}: {r.text}" for r in prev.itertuples())
                if len(prev)
                else None
            )
            assert got[(conv_id, row["turn_idx"])] == (ctx, row["text"])
    assert len(got) == n_expected


def test_scrub_pii_exact(spark):
    from miru_spark.operators.pii import PII_PATTERNS, scrub_pii

    rows = [
        ("a", "mail me at bob.smith+x@corp.example.org now"),
        ("b", "hosts 10.0.3.7 and 192.168.1.200, call 555-123-4567"),
        ("c", "no pii here, just 1.2 version and 12-34 range"),
        ("d", "two mails x@y.io z@w.co and ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r.asDict() for r in scrub_pii(df).collect()}

    for rid, text in rows:
        cur = text
        for name, pat, token in PII_PATTERNS:
            assert got[rid][f"n_{name}"] == len(re.findall(pat, cur))
            cur = re.sub(pat, token, cur)
        assert got[rid]["scrubbed"] == cur

    assert got["a"]["n_email"] == 1 and "<EMAIL>" in got["a"]["scrubbed"]
    assert got["b"]["n_ipv4"] == 2 and got["b"]["n_phone"] == 1
    assert got["c"]["scrubbed"] == rows[2][1]  # untouched
    assert got["d"]["n_email"] == 2 and got["d"]["n_ipv4"] == 1
