#!/usr/bin/env python
"""Benchmark harness: runs the headline query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query executes as a count()/collect-to-driver action so the full plan
(including Python UDF stages) runs; timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: the heavy hitters across scan/join/agg/window/codec/LLM-ops
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_volume",
    "agg_supplier_part_stats",
    "window_top_orders_per_customer",
    "join_asof_last_click",
    "join_range_error_window",
    "events_hourly_rollup",
    "events_sessionize",
    "reassembly_ordered_chunks",
    "codec_roundtrip_count",
    "dedup_minhash_lsh",
    "sim_ivf_topk",
    "text_bpe_token_stats",
    "curation_training_set",
    # round-2 extension surface
    "pivot_segment_year",
    "window_frames_showcase",
    "sql_correlated_above_avg",
    "stream_hourly_watermarked",
    "text_decontaminate",
    "sketch_kmv_distinct",
    "dedup_incremental_lsh",
    # round-3 additions: the newest heavy paths
    "stream_session_windows",
    "curation_packed_set",
    "text_pack_sequences",
    "text_bm25_search",
    "bucketed_join_order_totals",
    # round-4 additions: stream-stream join + sub-document dedup +
    # repetition filters
    "stream_stream_join_pairs",
    "dedup_subdoc_spans",
    "dedup_remove_repeated",
    "text_repetition_signals",
    "curation_full_set",
    "text_bpe_train",
    "text_bpe_encode",
    # round-5 additions: OR-amplified LSH, incremental span dedup,
    # no-straddle BFD packing, in-engine WAV resample
    "sim_lsh_multitable",
    "dedup_incremental_spans",
    "text_pack_bins_bfd",
    "mm_audio_resample",
    # round-5 session-2: fixed-point LM family, fuzzy join, pagerank,
    # table-format merge, LM-filtered curation, audio VAD
    "text_lm_surprisal",
    "text_lm_bigram",
    "text_nb_classify",
    "join_fuzzy_names",
    "graph_pagerank_events",
    "merge_upsert_part",
    "curation_lm_filtered",
    "mm_audio_vad",
    # round-5 session-3 additions: clustering + content-defined chunking
    "cluster_kmeans_embeddings",
    "dedup_semantic_clusters",
    "dedup_cdc_chunks",
    "text_phrase_search",
    "text_cooccurrence_pmi",
    "events_concurrency_peaks",
    "stats_trimmed_mean",
    "sim_pooled_rerank",
    # round-5 session-4: rank-based trend, distributed shuffle-shard,
    # fixed-point lexical entropy
    "stats_spearman_daily",
    "curation_shuffle_shards",
    "text_token_entropy",
    "mm_image_dhash_dedup",
    "stats_sigma_outliers",
    "curation_entropy_filtered",
    # round-6: rolling-hash CDC boundary (the cheap path vs the md5 anchor),
    # hashed-BoW topic clustering, rank-sum shift test, fixed-point EWMA
    "dedup_cdc_rolling",
    "text_topics_kmeans",
    "stats_mann_whitney",
    "events_ewma_daily",
    "text_bpe_compression",
    "sample_weighted_orders",
    "mm_audio_fingerprint",
    # round-8 additions: sorted-neighborhood blocking + PQ/ADC ANN +
    # the composed IVF-PQ pipeline
    "dedup_sorted_neighborhood",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "graph_label_communities",
    "curation_dsir_select",
    "sample_surprisal_strata",
    "sketch_overlap_matrix",
    # scale-technique surface (queries_scale.py)
    "join_bloom_prefilter",
    "dedup_winnow_overlap",
    "search_rrf_fusion",
    "events_interpolate_gaps",
    "stats_quantile_normalize",
    "stats_source_kl",
    # round-9 debuts (benched from round 10 on): persisted IVF-PQ index
    # lifecycle, degree-oriented triangle counting, RAKE keywords,
    # 8-gram novelty
    "sim_ivfpq_persisted",
    "graph_triangle_count",
    "text_rake_keywords",
    "text_ngram_novelty",
    # round-10 debuts: exact radius search, k-core peeling, per-token
    # chi-square feature selection
    "sim_range_search",
    "graph_kcore",
    "graph_clustering_coeff",
    "text_chi2_tokens",
    # round-10 second wave: containment dedup, canonical survivor pick,
    # MMR diversified re-ranking
    "dedup_containment",
    "dedup_canonical_pick",
    "search_mmr_rerank",
    "text_boilerplate_strip",
    # round-10 fourth wave: RA link prediction, Markov transitions,
    # Gopher quality rules, Kendall tau-a
    "graph_link_predict",
    "events_markov_transitions",
    "text_gopher_quality",
    "stats_kendall_daily",
    # round-10 fifth wave: distributed covariance + top principal
    # component (integer power iteration)
    "embed_top_pc",
    # round-10 sixth wave: one-way ANOVA F, Zipf rank-frequency slope
    "stats_anova_f",
    "text_zipf_slope",
    # round-10 seventh wave: path mining, change-point detection
    "events_path_ngrams",
    "events_changepoint",
    # round-10 eighth wave: nearest-direction as-of join
    "join_asof_nearest",
    # round-10 ninth wave: Theil-Sen robust median slope
    "stats_theil_sen",
    # round-10 tenth wave: pointer-doubling hierarchy, RFM segmentation
    "graph_hierarchy_depth",
    "agg_rfm_segments",
    # round-10 eleventh wave: exact prefix-filtering similarity join
    "dedup_prefix_filter",
    # round-10 twelfth wave: Benford leading-digit audit
    "dq_benford_totals",
    # round-10 thirteenth wave: Davies-Bouldin cluster quality
    "cluster_db_index",
    # round-11 debuts: occupancy-sized auto rerank depth (IVF-PQ), the
    # PNG encode->decode roundtrip through the from-scratch codec,
    # per-source PSI drift, ROUGE-2 clipped overlap
    "sim_ivfpq_auto_depth",
    "mm_png_roundtrip_stats",
    "stats_psi_drift",
    "text_rouge_bigram",
    # round-11 fourth wave: NDCG@5 ranking evaluation
    "search_ndcg_eval",
    # round-11 fifth wave: streamed PSI drift monitor
    "stream_psi_drift",
    # round-11 sixth wave: char-trigram NB language identification
    "text_langid_trigram",
    # round-12 debuts: profile-capped Cavnar-Trenkle lang-id, baseline
    # JPEG roundtrip through the from-scratch codec
    "text_langid_profile",
    "mm_jpeg_roundtrip_stats",
    # round-12 third wave: weak-labeler agreement + per-domain cap
    "eval_cohen_kappa",
    "curation_domain_cap",
    # round-12 fourth wave: leakage-safe split + token-budget fill
    "curation_leakage_split",
    "curation_token_budget",
    # round-12 fifth wave: macro P/R/F1, BLEU-2, lexical diversity, ACF
    "eval_f1_macro",
    "text_bleu_bigram",
    "text_lexical_diversity",
    "stats_acf_daily",
    # round-12 sixth wave: GIF/LZW + mu-law codec roundtrips
    "mm_gif_roundtrip_stats",
    "mm_audio_mulaw",
    # round-12 seventh wave: SQ8 asymmetric search
    "sim_sq8_topk",
    # round-12 eighth wave: 3-labeler Fleiss panel agreement
    "eval_fleiss_kappa",
    # round-12 ninth wave: Flesch-Kincaid readability
    "text_readability",
    # round-12 tenth wave: CUSUM drift chart
    "events_cusum_daily",
    # round-12 eleventh wave: ISO-BMFF sample-table roundtrip
    "mm_mp4_sample_index",
    # round-12 twelfth wave: runs test + day-of-week profile
    "stats_runs_test",
    "events_dow_profile",
    # round-12 thirteenth wave: streamed CUSUM monitor
    "stream_cusum_drift",
    # round-12 fourteenth wave: MAD robust outliers
    "stats_mad_outliers",
    # round-13 debuts: capped Fleiss panel, amortized persisted-index
    # IVF-PQ serve (the timed runs measure serve -- the build is paid by
    # the process's first call), 16-bit VAD over mu-law audio, Adam7
    # interlaced PNG roundtrip
    "eval_fleiss_kappa_capped",
    "sim_ivfpq_index_search",
    "mm_audio_vad16",
    "mm_png_adam7_roundtrip",
    # round-13 fifth wave: the NB model in its serving shape (train
    # once per process, score from the saved model)
    "text_langid_served",
    # round-14 debuts: the capped Fleiss panel served from the
    # persisted NB model slot (the timed runs measure the amortized
    # panel -- the train is paid by the process's first call, exactly
    # like sim_ivfpq_index_search / text_langid_served)
    "eval_fleiss_kappa_served",
    # round-14 second wave: Krippendorff's alpha -- the missing-data
    # panel agreement (partial units kept), NB rater from the shared
    # model slot
    "eval_krippendorff_alpha",
    # round-14 third wave: the served NB model scoring a document
    # stream (foreachBatch per-micro-batch serve, append parquet sink)
    "stream_langid_served",
    # round-14 fourth wave: JL sign-random projection 64->16 (zero
    # shuffle; the dimension-reduction step before LSH/k-means/rerank)
    "embed_jl_project",
    # round-14 fifth wave: per-category specific agreement of the
    # served panel (the which-category-disagrees diagnostic)
    "eval_specific_agreement",
    # round-14 sixth wave: the binary-string <-> trits bridge (SURVEY
    # ops 34-35, closing the reference surface to 52/52; native conv()
    # expressions) and the hash-seeded bootstrap CI (deterministic
    # md5-indexed draws, rank-statistic interval)
    "codec_trit_bridge",
    "stats_bootstrap_ci",
    # round-15 (VERDICT r14 ask #3): the remaining 72 registry entries,
    # previously receipt-less -- every queries() entry now gets a wall
    # receipt in BENCH_CONTEXT.json each round, and the set-equality
    # assert in main() keeps future debuts from shipping without one.
    "window_follow_stats",
    "map_scalar_showcase",
    "dq_events_expectations",
    "agg_salted_hot_keys",
    "sample_allocate_budget",
    "agg_mode_per_type",
    "stats_selection_quantiles",
    "dedup_exact_groups",
    "sketch_cms_heavy_hitters",
    "stats_ks_two_sample",
    "codec_repair_stats",
    "join_anti_idle_customers",
    "sim_mine_triplets",
    "orc_xml_roundtrip_part",
    "events_retention_cohorts",
    "agg_value_histogram",
    "json_roundtrip_events",
    "join_semi_active_customers",
    "join_full_outer_year_cohorts",
    "join_salted_lineitem_supplier",
    "agg_rollup_priority_year",
    "agg_cube_priority_status",
    "percentile_value_by_type",
    "sql_grouping_sets",
    "window_running_customer_spend",
    "sort_global_topk_orders",
    "set_ops_customer_cohorts",
    "str_scalar_showcase",
    "date_scalar_showcase",
    "array_scalar_showcase",
    "json_props_extract",
    "events_funnel_steps",
    "events_resample_daily",
    "events_sliding_windows",
    "sample_stratified_events",
    "csv_roundtrip_nation_region",
    "codec_chunk_stats",
    "stream_static_enrich",
    "stream_dedup_users",
    "stream_stateful_user_totals",
    "stream_dedup_watermarked",
    "curation_incremental_set",
    "curation_snapshot_diff",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "sim_topk_bruteforce",
    "sim_lsh_bucketed",
    "text_token_stats",
    "text_top_terms",
    "text_quality_score",
    "text_pii_scrub",
    "text_lang_id",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_chunk_windows",
    "profile_documents",
    "sketch_hll_distinct",
    "sketch_quantiles",
    "sketch_kmv_overlap",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_binary_stats",
    "embed_quantize_int8",
    "stats_linear_trend",
    "sample_temperature_sources",
    "events_rolling_active_users",
    "events_anomaly_days",
    "stats_chi_square",
    "sample_hash_split",
    "cluster_assign_incremental",
]


# Recycle the SparkSession every this-many queries (r11 protocol; see
# _fresh_session).  3 restarts across the ~110-query run, ~5 s each.
SESSION_RECYCLE_EVERY = 36


def _warm_session(spark) -> None:
    """Warm a (possibly fresh) session so timings measure plans, not
    engine cold start: parquet footers, the Arrow Python-worker pool
    across all cores, and the Structured Streaming machinery."""
    # warm the JVM + parquet footers once so timings measure the queries
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    # warm the Python-worker pool across all cores: the first Arrow UDF task
    # on a fresh worker pays fork+import (~0.5s); doing it once here keeps
    # per-query timings about the plan, not interpreter startup
    import pyspark.sql.functions as F

    from airflow_pipeline_text_processing_spark.functions.codec_udfs import (
        decode_chunks,
        encode_chunks,
    )

    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )
    warm = warm.withColumn("chunks", encode_chunks(F.col("id").cast("string")))
    warm.withColumn("r", decode_chunks("chunks")).select(F.count("r")).collect()
    # warm the Structured Streaming machinery (micro-batch planner, state
    # store provider, streaming Arrow path) with one one-row drain, so the
    # stream queries' first timed run measures the stream, not engine
    # cold start
    import tempfile as _tf

    _warm_src = _tf.mkdtemp(prefix="bench_warm_src_")
    spark.range(1).selectExpr(
        "timestamp_micros(id) AS ts", "id AS user_id"
    ).write.mode("overwrite").parquet(_warm_src)
    (
        spark.readStream.schema("ts timestamp, user_id long")
        .parquet(_warm_src)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .count()
        .writeStream.format("memory")
        .queryName("bench_warm_stream")
        .outputMode("complete")
        .option("checkpointLocation", _tf.mkdtemp(prefix="bench_warm_ckpt_"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _fresh_session(prev=None):
    """(Re)create the bench session.  r11 protocol fix for cross-round
    comparability (VERDICT r10 ask #8): a single 110-query session
    accretes heap debt -- cached shuffle metadata, codegen classes,
    Python-worker heap -- that inflates LATE entries, so a query's
    reported wall depended on its position in BENCH_QUERIES and drifted
    as earlier rounds' lists grew.  Stopping the SparkContext every
    SESSION_RECYCLE_EVERY queries drops that state while the JVM (and
    its JIT caches) persists; each fresh session is re-warmed, and each
    query still gets its own untimed warm run."""
    from airflow_pipeline_text_processing_spark.session import get_spark

    if prev is not None:
        prev.stop()
    spark = get_spark("bench")
    # Silence WARN noise in the captured tail.  In particular the
    # "WindowExec: No Partition Defined" warnings here are BY DESIGN: they
    # come from the offsets window of the two-level running sum
    # (operators/windows.py::ordered_running_sum), which runs over
    # O(parallelism) partition totals -- bounded and asserted so in
    # tests/test_plans.py -- never over data.
    spark.sparkContext.setLogLevel("ERROR")
    _warm_session(spark)
    return spark


def _jvm_count() -> int:
    """Count java processes on the box (``pgrep -c java``): the r13
    measurement discipline's orphaned-JVM check, recorded per query so
    driver readings self-adjudicate (verdict r13 ask #4).  Returns -1
    when pgrep is unavailable."""
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-c", "java"], capture_output=True, timeout=5
        )
        # pgrep exits 1 with "0" on no match; both paths print a count
        return int(out.stdout.strip() or 0)
    except Exception:  # noqa: BLE001 -- diagnostics must never fail the bench
        return -1


_CTX_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_CONTEXT.json"
)

# Regression tripwire thresholds (r15, verdict ask #7): flag a query when
# its best-of-2 grew by BOTH >1.5x and >0.3 s vs the previous run's sidecar
# (the committed BENCH_CONTEXT.json).  The absolute floor keeps sub-second
# entries' scheduler jitter (0.1 s -> 0.2 s) from crying wolf; the ratio
# keeps slow entries' proportional noise out.  Flags are advisory (printed
# in the JSON receipts, never an exit code): load_env + jvm_count let the
# reader adjudicate machine noise vs real regression.
_REGRESS_RATIO = 1.5
_REGRESS_FLOOR_S = 0.3


def _load_baseline() -> tuple[dict[str, float], object]:
    """Previous run's per-query best-of-2 from the committed sidecar
    (written by the last bench run, committed by the round driver)."""
    try:
        with open(_CTX_PATH) as fh:
            prev = json.load(fh)
        base = {
            n: min(row["runs"])
            for n, row in prev.get("queries", {}).items()
            if row.get("runs")
        }
        return base, prev.get("sf")
    except Exception:  # noqa: BLE001 -- first run / corrupt sidecar: no baseline
        return {}, None


def main() -> None:
    from __spark_entry__ import REGISTRY

    from airflow_pipeline_text_processing_spark.session import (
        sweep_persistent_rdds,
    )

    # full-registry receipts (r15, verdict ask #3): every queries() entry
    # must appear in the bench list -- a future debut without a wall-time
    # receipt is an error, not a silent gap
    missing_receipts = sorted(set(REGISTRY) - set(BENCH_QUERIES))
    stale_names = sorted(set(BENCH_QUERIES) - set(REGISTRY))
    assert not missing_receipts, f"registry entries not benched: {missing_receipts}"
    assert not stale_names, f"benched names not in registry: {stale_names}"

    baseline, baseline_sf = _load_baseline()

    spark = _fresh_session()
    session_born = time.monotonic()

    timings: dict[str, float] = {}
    # Per-query environment context (r12, verdict ask #1): a driver bench
    # reading must be SELF-ADJUDICATING -- r10/r11 both spent a verdict
    # cycle deciding whether a 1.4-2.7x mover was code or machine load.
    # For every query we record the 1-min loadavg sampled right before
    # the timed runs (load the NEIGHBORS put on the box), the position
    # index in the run, the age of / query count on the current session
    # (heap-debt proxies the recycle protocol bounds), and BOTH timed
    # readings (spread = noise floor).  Written to BENCH_CONTEXT.json
    # beside the repo's BENCH_rN receipt; the compact tail line carries
    # the load envelope so the driver's 2000-char capture always shows it.
    context: dict[str, dict] = {}
    loads: list[float] = []
    for i, name in enumerate(BENCH_QUERIES):
        if i and i % SESSION_RECYCLE_EVERY == 0:
            spark = _fresh_session(spark)
            session_born = time.monotonic()
        fn, _oracle = REGISTRY[name]
        load1 = os.getloadavg()[0]
        loads.append(load1)
        try:
            # One UNTIMED warm execution per query (added r9): a
            # first-ever run pays JIT/codegen-cache/classloading costs
            # that best-of-2 does not filter -- r8's debut
            # sample_weighted_orders posted 2.04 s cold vs ~0.7 s steady
            # (adjudicated in VERDICT r8).  Warming every query makes
            # the reported number the steady state, which is the honest
            # at-scale quantity; methodology change in PROFILE_r09.
            fn(spark, SF_DIR).collect()
            # Sweep checkpoint residue before the timed runs (r14,
            # verdict ask #4 -- the PROFILE_r13 §5 discipline, now the
            # engine API): pinned RDD blocks left by this query's warm
            # run and by every neighbor otherwise fight the timed runs'
            # execution memory.  Each timed run builds fresh lineage, so
            # a swept checkpoint just re-materializes -- the reading
            # stays the QUERY's cost, not the session history's.
            swept = sweep_persistent_rdds(spark)
            # Sampled AFTER the warm run (r14 self-review): a heavy
            # warm pass takes seconds-to-minutes, long enough for a
            # neighbor JVM to appear or vanish -- the count must
            # describe the box the TIMED runs see.
            jvms = _jvm_count()
            # Level the GC debt before the timed runs (r11, untimed):
            # without this a query pays for however much garbage its
            # NEIGHBORS left, which is the position-dependence the
            # recycle protocol removes.
            spark.sparkContext._jvm.System.gc()
            runs: list[float] = []
            # two fresh-lineage runs, keep the best: filters CPU-neighbor
            # noise without letting Spark reuse the first run's shuffles
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.collect()
                runs.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # noqa: BLE001 -- record, keep benching
            # One broken query must not cost the round EVERY number
            # (r12): record the failure, keep the rest of the table, and
            # exit nonzero at the end so the driver still sees a FAIL.
            # The session may be poisoned (cancelled jobs, leaked temp
            # views) -- recycle it before the next query.
            context[name] = {
                "error": f"{type(exc).__name__}: {exc}"[:300],
                "load1_before": round(load1, 2),
                "position": i,
            }
            spark = _fresh_session(spark)
            session_born = time.monotonic()
            continue
        timings[name] = min(runs)
        context[name] = {
            "runs": runs,
            "load1_before": round(load1, 2),
            # r14 (verdict ask #4): JVM count on the box right before
            # the timed runs -- >1 means a neighbor Spark (driver
            # grading, a stray orphan) shared the cores -- and the
            # number of pinned RDD blocks the pre-timing residue sweep
            # dropped, so every reading fully self-adjudicates.
            "jvm_count": jvms,
            "residue_swept": swept,
            "position": i,
            "session_age_s": round(time.monotonic() - session_born, 1),
            "session_query_idx": i % SESSION_RECYCLE_EVERY,
        }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)
    # round-over-round regression tripwire (r15, verdict ask #7): compare
    # each entry's best-of-2 against the previous sidecar at the SAME sf
    regressions = {}
    if baseline and baseline_sf == sf_val:
        for name, now in timings.items():
            prev_t = baseline.get(name)
            if (
                prev_t
                and now > _REGRESS_RATIO * prev_t
                and now - prev_t > _REGRESS_FLOOR_S
            ):
                regressions[name] = {
                    "prev": prev_t,
                    "now": now,
                    "ratio": round(now / prev_t, 2),
                }
    load_env = {
        "load1_start": round(loads[0], 2) if loads else None,
        "load1_end": round(loads[-1], 2) if loads else None,
        "load1_max": round(max(loads), 2) if loads else None,
        "load1_median": round(sorted(loads)[len(loads) // 2], 2)
        if loads
        else None,
    }
    # full per-query context sidecar: lands in the working tree, so the
    # round driver's end-of-round commit preserves it next to BENCH_rN
    with open(_CTX_PATH, "w") as fh:
        json.dump(
            {"sf": sf_val, "total": total, "load_env": load_env,
             "regressions": regressions, "queries": context},
            fh,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    # The detailed line above outgrows the driver's 2000-char tail capture
    # (65+ per-query entries), which truncated the receipt mid-number in
    # rounds 6-7 (BENCH_r0{6,7}.json "parsed: null").  Emit a final compact
    # summary line so the last 2000 chars always contain complete JSON --
    # including the load envelope that makes the total self-adjudicating.
    failed = sorted(
        name for name, row in context.items() if "error" in row
    )
    # Driver-parsable per-query receipts (r16, verdict ask #1): the full
    # "queries" line above is ~6 KB -- it can NEVER fit the 2000-char tail,
    # which is why PERF_r15 ended with per_query: {} / geomean: null.  Emit
    # a SECOND compact line immediately before the headline line, sized so
    # both always survive the tail capture together: entries sorted by
    # descending wall (where optimization effects are visible), 2-decimal
    # values, as many as fit a fixed byte budget.  ADDITION only -- the two
    # existing lines are byte-identical in shape to r15.  Complete per-query
    # receipts (both timed runs + environment context) remain in
    # BENCH_CONTEXT.json, committed beside BENCH_rN each round.
    compact_pq: dict[str, float] = {}
    pq_line = {
        "metric": "per_query_wall",
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "queries": compact_pq,
    }
    _PQ_BUDGET = 1200  # + headline line (~500 incl. regressions) < 2000
    for name, t in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        compact_pq[name] = round(t, 2)
        if len(json.dumps(pq_line, separators=(",", ":"))) > _PQ_BUDGET:
            del compact_pq[name]
            break
    print(json.dumps(pq_line, separators=(",", ":")))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf_val,
                "load_env": load_env,
                "n_regressions": len(regressions),
                **(
                    {"regressions": {
                        n: r["ratio"] for n, r in sorted(regressions.items())
                    }}
                    if regressions
                    else {}
                ),
                **({"failed_queries": failed} if failed else {}),
            }
        )
    )
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
