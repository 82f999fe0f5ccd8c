"""Stateful inbox/unread streaming operator (reference READ/UNREAD/
MARK_ALL_READ semantics)."""

from __future__ import annotations

from miru_spark.streaming.unread import unread_counts

SCHEMA = "stream_id string, user_id long, kind string, msg_id long, ts timestamp"


def _run(spark, src, ckpt, qname):
    ev = spark.readStream.schema(SCHEMA).parquet(src)
    collected: list = []

    def sink(batch, epoch_id):
        collected.extend(batch.collect())

    q = (
        unread_counts(ev)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    # update mode emits one row per touched key per batch; last wins
    return {
        (r["user_id"], r["stream_id"]): (r["n_msgs"], r["unread"], r["last_read"])
        for r in collected
    }


def test_unread_lifecycle(spark, tmp_path):
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    batch1 = [
        ("s1", 1, "msg", 10, "2024-01-01 00:00:00"),
        ("s1", 1, "msg", 11, "2024-01-01 00:01:00"),
        ("s1", 1, "msg", 12, "2024-01-01 00:02:00"),
        ("s1", 1, "read", 10, "2024-01-01 00:03:00"),
        ("s2", 1, "msg", 5, "2024-01-01 00:00:30"),
        ("s1", 2, "msg", 10, "2024-01-01 00:00:10"),
        ("s1", 2, "mark_all_read", -1, "2024-01-01 00:04:00"),
    ]
    df = spark.createDataFrame(batch1, SCHEMA.replace("timestamp", "string"))
    from pyspark.sql import functions as F

    df.withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(src)
    out = _run(spark, src, ckpt, "unread1")
    assert out[(1, "s1")] == (3, 2, 10)  # 11,12 unread after read<=10
    assert out[(1, "s2")] == (1, 1, -1)
    assert out[(2, "s1")] == (1, 0, 10)  # mark_all_read clears

    # batch 2 arrives: state carries across restarts via checkpoint
    batch2 = [
        ("s1", 1, "read", 12, "2024-01-01 00:05:00"),
        ("s2", 1, "msg", 6, "2024-01-01 00:05:30"),
    ]
    df2 = spark.createDataFrame(batch2, SCHEMA.replace("timestamp", "string"))
    df2.withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(src)
    out2 = _run(spark, src, ckpt, "unread2")
    assert out2[(1, "s1")] == (3, 0, 12)  # all read now
    assert out2[(1, "s2")] == (2, 2, -1)


class _FakeState:
    """Minimal GroupState stand-in to drive _update directly."""

    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def test_hot_key_state_stays_bounded():
    """A hot inbox (bot) that reads as it receives holds O(unread) state
    — the pending list never accumulates history (10k msgs, watermark
    chasing 50 behind → state carries <= 50 ids, not 10k)."""
    import pandas as pd

    from miru_spark.streaming.unread import _update

    st = _FakeState()
    n = 10_000
    for lo in range(0, n, 1_000):  # 10 micro-batches
        rows = []
        for m in range(lo, lo + 1_000):
            rows.append(("msg", m, m))
            if m % 10 == 0:  # reader trails 50 ids behind
                rows.append(("read", max(m - 50, -1), m))
        pdf = pd.DataFrame(rows, columns=["kind", "msg_id", "ts"])
        out = list(_update((7, "hot"), iter([pdf]), st))[0]
    n_msgs, last_read, max_seen, pending = st.get
    assert n_msgs == n and max_seen == n - 1
    assert last_read == n - 10 - 50  # last read event: m=9990 → 9940
    assert len(pending) == (n - 1) - last_read  # O(unread), not O(history)
    assert len(pending) < 100
    assert int(out["unread"].iloc[0]) == len(pending)
    assert int(out["n_msgs"].iloc[0]) == n
