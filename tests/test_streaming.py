"""Streaming ingest (sip) + windowed waveform over a file source."""

from __future__ import annotations

import pytest

from miru_spark.indexing.incremental import SegmentStore
from miru_spark.oracle import PandasIndex
from miru_spark.query.bm25 import search
from miru_spark.streaming.ingest import stream_ingest, streaming_waveform


def _write_chunk(df, path):
    df.write.mode("append").parquet(path)


def _drain(q):
    """availableNow triggers self-terminate; block until they truly do
    (a live foreachBatch callback leaking into the next test breaks the
    py4j callback server)."""
    assert q.awaitTermination(180), "stream did not terminate in time"


@pytest.mark.parametrize("n_shards", [2])
def test_stream_ingest_matches_batch(
    spark, tiny_turns, tiny_pdf, tmp_path, n_shards
):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    store = SegmentStore(spark, str(tmp_path / "seg"), n_shards=n_shards)

    # chunk 1 arrives
    _write_chunk(tiny_turns.where("conv_id < 'conv00000050'"), src)
    q = stream_ingest(spark, src, store, ckpt)
    _drain(q)
    n1 = store.load().n_docs
    assert 0 < n1 < len(tiny_pdf)

    # chunk 2 arrives later; a new availableNow run drains only new files
    _write_chunk(tiny_turns.where("conv_id >= 'conv00000050'"), src)
    q = stream_ingest(spark, src, store, ckpt)
    _drain(q)
    idx = store.load()
    assert idx.n_docs == len(tiny_pdf)

    got = search(idx, "w00001 AND w00004", k=10).toPandas()
    exp = PandasIndex(tiny_pdf).search("w00001 AND w00004", k=10)
    gscores = sorted(round(s, 6) for s in got["score"])
    escores = sorted(round(s, 6) for s in exp["score"])
    assert gscores == escores
    # manifest recorded streaming deltas with lineage
    assert any(e["delta"] > 0 for e in store.manifest())


def test_stream_ingest_with_inline_compaction(
    spark, tiny_turns, tiny_pdf, tmp_path
):
    """compact_every folds the tiered merger into the sip loop: a
    long-running tail keeps live unit counts bounded instead of one
    delta per shard per batch, and serving stays oracle-identical."""
    src = str(tmp_path / "incoming_c")
    ckpt = str(tmp_path / "ckpt_c")
    store = SegmentStore(spark, str(tmp_path / "seg_c"), n_shards=2)

    cuts = ["conv00000025", "conv00000050", "conv00000075", None]
    lo = None
    for hi in cuts:
        chunk = tiny_turns
        if lo is not None:
            chunk = chunk.where(f"conv_id >= '{lo}'")
        if hi is not None:
            chunk = chunk.where(f"conv_id < '{hi}'")
        _write_chunk(chunk, src)
        q = stream_ingest(
            spark, src, store, ckpt, compact_every=1, merge_factor=2
        )
        _drain(q)
        lo = hi
        # bounded: tiered merges keep every shard at <= 2 live units
        for s in range(2):
            assert len(store._live_shard_units(s)) <= 2

    idx = store.load()
    assert idx.n_docs == len(tiny_pdf)
    # compaction actually ran: partial merged_{lo}_{hi} spans exist
    assert any("merged_" in u.rsplit("/", 1)[-1] for u in store.live_units())
    got = search(idx, "w00001 AND w00004", k=10).toPandas()
    exp = PandasIndex(tiny_pdf).search("w00001 AND w00004", k=10)
    assert sorted(round(s, 6) for s in got["score"]) == sorted(
        round(s, 6) for s in exp["score"]
    )


def test_streaming_waveform_memory_sink(spark, tiny_turns, tmp_path):
    src = str(tmp_path / "wave_in")
    tiny_turns.limit(200).write.parquet(src)
    agg = streaming_waveform(spark, src, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("wave_out")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.sql("SELECT * FROM wave_out").toPandas()
    assert len(out) > 0
    assert {"bucket_start", "bucket_end", "term", "n"} <= set(out.columns)
    assert (out["n"] > 0).all()
