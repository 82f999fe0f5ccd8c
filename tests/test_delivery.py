"""Realtime delivery (streaming/delivery.py): subscription matching,
staleness cutoff, exactly-once across availableNow restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from miru_spark.streaming.delivery import deliver_stream, match_subscriptions


def _drain(q):
    assert q.awaitTermination(180), "stream did not terminate in time"


SUBS = [
    ("s_w1", "w00001"),
    ("s_and", "w00001 AND w00004"),
    ("s_pre", "w0000*"),
    ("s_role", "w00001 AND role:assistant"),
]


def _expected(pdf, query_terms_check):
    """Row-by-row python oracle over the tiny corpus."""
    from miru_spark.tokenize import tokenize_py

    out = set()
    for r in pdf.itertuples():
        toks = tokenize_py(r.text)
        if query_terms_check(set(toks), r):
            out.add((r.conv_id, r.turn_idx))
    return out


def test_match_subscriptions_against_oracle(spark, tiny_turns, tiny_pdf):
    got = match_subscriptions(tiny_turns, SUBS).collect()
    by_sub: dict[str, set] = {}
    for r in got:
        by_sub.setdefault(r["sub_id"], set()).add((r["conv_id"], r["turn_idx"]))

    assert by_sub.get("s_w1", set()) == _expected(
        tiny_pdf, lambda t, r: "w00001" in t
    )
    assert by_sub.get("s_and", set()) == _expected(
        tiny_pdf, lambda t, r: "w00001" in t and "w00004" in t
    )
    assert by_sub.get("s_pre", set()) == _expected(
        tiny_pdf, lambda t, r: any(x.startswith("w0000") for x in t)
    )
    assert by_sub.get("s_role", set()) == _expected(
        tiny_pdf, lambda t, r: "w00001" in t and r.role == "assistant"
    )


def test_staleness_cutoff(spark, tiny_turns):
    """drop_older_than drops rows older than max(ts) - interval."""
    all_rows = match_subscriptions(tiny_turns, [("s", "w00001")]).count()
    # tiny corpus spans ~27 minutes; a 10-minute cutoff bites
    fresh = match_subscriptions(
        tiny_turns, [("s", "w00001")], drop_older_than="10 MINUTES"
    )
    fresh_rows = fresh.count()
    assert 0 < fresh_rows < all_rows
    mx = tiny_turns.agg(F.max("ts")).collect()[0][0]
    for r in fresh.collect():
        assert (mx - r["ts"]).total_seconds() <= 600


def test_deliver_stream_exactly_once(spark, tiny_turns, tiny_pdf, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "deliveries")
    ckpt = str(tmp_path / "ckpt")

    tiny_turns.where("conv_id < 'conv00000050'").write.mode("append").parquet(src)
    _drain(deliver_stream(spark, src, SUBS[:2], out, ckpt))
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # re-running with nothing new delivers nothing new (checkpoint)
    _drain(deliver_stream(spark, src, SUBS[:2], out, ckpt))
    assert spark.read.parquet(out).count() == n1

    # late chunk arrives -> only its matches are appended
    tiny_turns.where("conv_id >= 'conv00000050'").write.mode("append").parquet(src)
    _drain(deliver_stream(spark, src, SUBS[:2], out, ckpt))
    got = {
        (r["sub_id"], r["conv_id"], r["turn_idx"])
        for r in spark.read.parquet(out).collect()
    }
    exp = set()
    for sid, check in [
        ("s_w1", lambda t, r: "w00001" in t),
        ("s_and", lambda t, r: "w00001" in t and "w00004" in t),
    ]:
        for cid, tix in _expected(tiny_pdf, check):
            exp.add((sid, cid, tix))
    assert got == exp
