"""Per-round benchmark harness (driver contract).

Measures (1) index-build throughput in turns/sec over a deterministic
synthetic transcript corpus (the reference's disabled perf-harness shape:
batched build with rate accounting, MiruStreamServiceNGTest.java:113-155)
and (2) per-query latency of the headline query set over the sf-dir
corpus (MiruFullTextNGTest.java:146-188 shape). Prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_TURNS (default 300000 synthetic build turns).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_build_turns = int(os.environ.get("BENCH_TURNS", "300000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from miru_spark.index import InvertedIndex
    from miru_spark.session import get_spark
    from miru_spark.transcripts import generate_transcripts, transcripts_from_documents
    from miru_spark.driver_queries import QUERIES

    spark = get_spark("miru_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    t_all = time.time()
    timings: dict[str, float] = {}

    # ---- JVM/JIT warmup: exercise every timed code path on a small
    # corpus first (codegen compile + C2 otherwise pollutes the first
    # timed stage by 30-90s in this sandbox) ----
    import shutil
    import tempfile

    from miru_spark.query.bm25 import search as _search

    positions = os.environ.get("BENCH_POSITIONS", "0") == "1"
    warm_dir = tempfile.mkdtemp(prefix="miru_bench_warm_")
    warm = generate_transcripts(spark, n_convs=1500, max_turns=24, seed=7).persist()
    warm.count()
    widx = InvertedIndex.build_persisted(warm, warm_dir, positions=positions)
    _search(widx, "w00001 AND w00002", k=5).collect()
    warm.unpersist()
    shutil.rmtree(warm_dir, ignore_errors=True)
    timings["warmup"] = round(time.time() - t_all, 3)

    # ---- build throughput on synthetic corpus (~n_build_turns turns) ----
    n_convs = max(n_build_turns // 12, 1)  # avg ~12.5 turns/conv at max_turns=24
    turns = generate_transcripts(spark, n_convs=n_convs, max_turns=24, seed=42)
    turns = turns.persist()
    n_turns = turns.count()  # materialize input outside the timed window

    # two passes: pass 1 finishes JIT compilation of the heavy codegen
    # paths, pass 2 is the steady-state number a long-running cluster
    # job would see (documented in BASELINE.md).
    build_secs = []
    for _ in range(2):
        seg_dir = tempfile.mkdtemp(prefix="miru_bench_segments_")
        t0 = time.time()
        idx = InvertedIndex.build_persisted(turns, seg_dir, positions=positions)
        build_secs.append(time.time() - t0)
        n_postings = spark.read.parquet(f"{seg_dir}/postings").count()
        shutil.rmtree(seg_dir, ignore_errors=True)
    build_sec = min(build_secs)
    timings["index_build_cold"] = round(build_secs[0], 3)
    timings["index_build"] = round(build_sec, 3)
    turns_per_sec = n_turns / build_sec
    turns.unpersist()

    # ---- query latency over the sf-dir corpus ----
    qidx = InvertedIndex.build(
        transcripts_from_documents(spark, sf_dir), positions=False
    )
    # warm the cached tables
    qidx.postings.count()

    from miru_spark.query.bm25 import search

    headline = [
        ("q_and", "spark AND join", "bm25"),
        ("q_or", "hash OR merge", "bm25"),
        ("q_not", "window AND NOT join", "bm25"),
        ("q_prefix", "sca*", "bm25"),
        ("q_field", "role:assistant AND batch", "bm25"),
        ("q_time", "spark", "time"),
    ]
    # best-of-2 per query: the gVisor sandbox injects sporadic 20-90 s
    # stalls into single stages; noise here is slowdown-only, so min of
    # two passes is the steady-state number (pass 1 also absorbs any
    # one-time per-query index/cache construction, e.g. the positions
    # index behind ft_phrase).
    def timed(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    for name, q, strat in headline:
        timings[name] = timed(
            lambda q=q, strat=strat: search(qidx, q, k=10, strategy=strat).collect()
        )

    # non-fulltext operators at sf_dir
    for name in ["aggregate_counts_role", "waveform_events", "latest_per_user",
                 "tpch_q1", "topk_customers", "ft_phrase", "cooc_features",
                 "collab_filter", "dedup_exact", "dedup_minhash_lsh",
                 "knn_cosine", "text_quality", "ft_bm25_range",
                 "ft_bm25_authz", "ft_bm25_tsrange", "strut_scored",
                 "dedup_embedding_lsh", "knn_cosine_lsh",
                 # round-2 additions
                 "ft_bm25_blockmax", "ft_bm25_wand", "ft_snippets",
                 "analyze_locale", "waveform_delta", "knn_cosine_ivf",
                 "dedup_components", "hash_split_docs",
                 "stratified_sample_lang", "ft_bm25_page2",
                 "pack_sequences", "text_ngram_repetition",
                 "text_bpe_tokens", "pipeline_prepare",
                 "ft_phrase_query", "decontaminate_docs",
                 "ft_phrase_slop", "ft_bm25_wildcard", "ft_bm25_fuzzy",
                 "ft_bm25_boost", "pipeline_decontam",
                 "ft_more_like_this", "ft_bm25_field_group",
                 "term_suggest", "ft_bm25_regexp",
                 "contamination_report", "quality_weighted_sample",
                 "chunk_documents", "text_tfidf_keywords",
                 "text_unigram_logprob", "text_pmi_collocations",
                 "dedup_survivors", "embedding_clusters",
                 # round-2 late additions
                 "ft_collapse", "ft_grouped_topn", "ft_hybrid_rerank",
                 "ft_mmr_diverse", "spell_correct", "asof_purchase_click",
                 "range_join_clicks", "mixture_sample_sources",
                 "ft_rrf_fusion", "ft_bm25_synonym", "ft_facets",
                 "dedup_dup_spans", "dedup_span_strip",
                 "event_percentiles", "ft_significant_terms",
                 "conv_stats", "conv_role_flow", "conv_context_sft",
                 "text_pii_scrub", "ft_bm25_recency", "ft_lm_dirichlet",
                 "ft_percolate", "ft_bm25_expunge", "ft_bm25_snapshot",
                 "ft_bm25_context", "vocab_top_terms", "text_oov_rate",
                 "ft_explain", "text_length_histogram",
                 "streaming_waveform_counts", "ft_bm25_stream_ingest",
                 "streaming_unread_inbox", "ft_bm25_min_should_match",
                 "ft_bm25_dismax", "funnel_events", "retention_cohorts",
                 # round-3 additions
                 "strut_scored_max", "strut_scored_regression",
                 "ft_bm25_repair", "delivery_log",
                 "analyze_locale_stop", "analyze_breadth", "ft_bm25_ru",
                 "ft_bm25_batch", "ft_bm25_msm_clause",
                 "ft_phrase_store", "ft_bm25_batch_mixed",
                 # round-4 additions
                 "trending_regression", "trending_peaks",
                 "trending_leader", "trending_highest_peak",
                 "trending_multi", "trending_filtered",
                 "ft_bm25_batch_phrase", "multimodal_decode",
                 "multimodal_audio", "multimodal_resize",
                 "multimodal_frames"]:
        timings[name] = timed(
            lambda name=name: QUERIES[name](spark, sf_dir).collect()
        )

    from miru_spark.io import resolve_format

    total = time.time() - t_all
    out = {
        "metric": "bench_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "build_turns": n_turns,
        "build_postings": n_postings,
        "turns_per_sec": round(turns_per_sec, 1),
        "cpus": cpus,
        # segment format the writers resolved to (Iceberg when jars +
        # catalog conf exist — this container has neither, so parquet)
        "table_format": resolve_format(spark, "auto"),
    }
    # The driver captures a bounded TAIL of stdout; the full per-query
    # dict (~90 entries, >3 KB) overflowed it in round 2 and the line
    # arrived head-truncated ("parsed": null). Emit: (1) the full JSON
    # first (and persist it to BENCH/ for the record), then (2) a
    # compact line — headline queries only — as the very LAST line,
    # small enough to always survive the tail window.
    print(json.dumps(out))
    try:
        os.makedirs("BENCH", exist_ok=True)
        with open(f"BENCH/bench_full_sf{sf}.json", "w") as fh:
            json.dump(out, fh, indent=1)
    except OSError:
        pass
    compact_keys = [
        "warmup", "index_build_cold", "index_build",
        "q_and", "q_or", "q_not", "q_prefix", "q_field", "q_time",
        "ft_phrase", "ft_bm25_blockmax", "ft_bm25_wand",
        "dedup_minhash_lsh", "pipeline_prepare", "pipeline_decontam",
    ]
    compact = dict(out)
    compact["queries"] = {k: timings[k] for k in compact_keys if k in timings}
    compact["queries_full"] = f"BENCH/bench_full_sf{sf}.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
