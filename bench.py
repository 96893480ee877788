"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop write (computes every
output column, no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from node_etl_spark.plans import QUERIES  # noqa: E402
from node_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_topk_orders",
    "q05_group_count",
    "q06_vocab_join",
    "q07_order_details",
    "q08_quarter_rollup",
    "q09_unpivot_measures",
    "q10_running_total",
    "q12_hierarchy_levels",
    "q13_semi_join",
    "q16_routed_split",
    "q20_dedup_exact",
    "q21_ngram_jaccard_pairs",
    "q22_minhash_lsh_dedup",
    "q23_simhash_pairs",
    "q24_text_profile",
    "q26_embedding_topk",
    "q27_ann_lsh_topk",
    "q28_asof_join",
    "q29_range_join",
    "q30_array2map",
    "q32_tree_build",
    "q33_quality_lang",
    "q34_top_orders_per_cust",
    "q35_embedding_neardup",
    "q36_media_metadata",
    "q37_frame_sample",
    "q38_ivf_topk",
    "q39_bpe_tokens",
    "q40_shipping_priority",
    "q41_nation_volume",
    "q43_grouping_sets",
    "q44_percentiles",
    "q45_first_event_per_user",
    "q50_chunk_documents",
    "q51_clean_text",
    "q54_dup_clusters",
    "q55_hash_split",
    "q56_stratified_sample",
    "q57_sessionize",
    "q58_priority_exists",
    "q60_small_qty_revenue",
    "q61_large_orders",
    "q64_returned_revenue",
    "q68_token_frequencies",
    "q70_trade_volume",
    "q71_market_share",
    "q76_forecast_revenue",
    "q77_product_profit",
    "q80_order_distribution",
    "q84_waiting_suppliers",
    "q85_repetition_signals",
    "q86_decontaminate",
    "q88_centroid_outliers",
    "q90_price_histogram",
    "q92_reorder_gaps",
    "q93_incremental_dedup",
    "q97_event_funnel",
    "q99_locf_imputation",
    "q100_value_anomalies",
    "q106_scd2_intervals",
    "q107_skew_profile",
    "q109_weighted_sample",
    "q110_rolling_distinct_users",
    "q113_partition_checksum",
    "q115_event_paths",
    "q116_dq_suite",
    "q117_psi_drift",
    "q118_sketch_rollup",
    "q119_bm25_search",
    "q120_brand_trend",
    "q121_trailing_window",
    "q122_part_pagerank",
    "q123_order_streaks",
    "q124_bitmap_distinct",
    "q125_golden_records",
    "q126_doc_keywords",
    "q127_corr_matrix",
    "q128_basket_pairs",
    "q129_hashed_features",
    "q130_part_reach",
    "q131_pack_sequences",
    "q132_token_entropy",
    "q133_kmeans_step",
    "q134_linear_interp",
    "q135_session_window",
    "q136_neardup_lsh",
    "q139_pii_scrub",
    "q140_winnow_fingerprints",
    "q141_part_communities",
    "q142_part_distances",
    "q143_containment_dedup",
    "q144_brand_trend_ols",
    "q145_part_skyline",
    "q147_audio_energy",
    "q148_bigram_lm_score",
    "q150_mix_sources",
    "q151_audience_overlap",
    "q152_benford_audit",
    "q153_sorted_neighborhood",
    "q154_quantize_embeddings",
    "q155_resample_epochs",
    "q156_cusum_drift",
    "q157_negative_samples",
    "q158_concentration_audit",
    "q159_contrastive_triplets",
    "q160_triangle_census",
    "q161_kmv_cardinality",
    "q162_related_parts_ppr",
    "q163_ks_drift",
    "q164_boilerplate_strip",
    "q165_mannwhitney_auc",
    "q166_heavy_hitters",
    "q167_chisq_independence",
    "q168_mutual_information",
    "q169_semdedup",
    "q170_pq_codes",
    "q171_bloom_semi_join",
    "q172_bitext_mining",
    "q173_temperature_mix",
    "q174_part_kcore",
    "q175_degree_assortativity",
    "q176_partition_pruned_read",
    "q177_url_canonical_dedup",
    "q178_matryoshka_audit",
    "q179_quality_weighted_sample",
    "q180_hybrid_rrf",
    "q181_span_corruption",
    "q182_join_size_estimate",
    "q183_snapshot_diff",
    "q184_lateness_audit",
    "q185_distribution_match",
    "q186_conversation_assembly",
    "q187_preference_pairs",
    "q188_fd_audit",
    "q189_stream_heavy_hitters",
    "q190_pass_at_k",
    "q191_bradley_terry",
    "q192_schema_evolution",
    "q193_trimmed_mean",
    "q194_range_boundaries",
    "q195_sentence_truncate",
    "q196_leakage_safe_split",
    "q197_k_anonymity",
    "q198_survival_curve",
    "q199_kfold_assignment",
    "q200_dataset_card",
    "q201_skew_salted_activity",
    "q202_bitext_mining_lsh",
    "q203_zorder_layout",
    "q204_stream_interval_left",
    "q205_binary_sketches",
    "q206_sketch_neardup",
    "q207_semdedup_capped",
    "q208_zorder_kd",
    "q209_duplicate_spans",
    "q210_simhash_dedup_groups",
    "q211_ivf_pq_topk",
    "q212_retrieval_eval",
    "q213_rater_agreement",
    "q214_fs_record_linkage",
    "q215_media_dedup_groups",
    "q216_incremental_neardup",
    "q217_stream_enrich",
    "q218_kn_trigram_score",
    "q219_dsir_select",
    "q220_domain_cap",
    "q221_bpe_learn",
    "q222_cm_sketch",
    "q223_novelty_audit",
    "q224_blocklist_filter",
    "q225_jl_projection",
    "q226_top_pc_power",
    "q227_pmi_collocations",
    "q228_tokenizer_fertility",
    "q229_hits_hubs_authorities",
    "q230_quantile_calibrate",
    "q231_decayed_trending",
    "q232_hard_negatives",
    "q233_knn_label_eval",
    "q234_temporal_split",
    "q235_target_encoding",
    "q236_skipgram_pairs",
    "q237_source_divergence",
    "q238_wilson_ranking",
    "q239_funnel_count",
    "q240_theil_sen_trend",
    "q241_lead_lag_corr",
    "q242_line_dedup",
    "q243_hll_cardinality",
    "q244_rendezvous_shards",
    "q245_attribution",
    "q246_quota_sample",
    "q247_percolate",
    "q248_spearman_corr",
    "q249_sequence_mining",
    "q250_isotonic_fit",
    "q251_coec_ctr",
    "q252_adamic_adar",
    "q253_naive_bayes",
    "q254_conformal_coverage",
    "q255_dp_histogram",
    "q256_waterfill_budget",
    "q257_offpolicy_eval",
    "q258_ridge_cv",
    "q259_topic_segments",
    "q260_bh_fdr_screen",
    "q261_mahalanobis_outliers",
    "q262_sprt_monitor",
    "q263_chao1_vocab",
    "q264_seasonal_decompose",
    "q265_ewma_anomalies",
    "q266_hll_set_algebra",
    "q267_source_ablation",
    "q268_shapley_vocab",
    "q269_hill_tail_index",
    "q270_kcenter_coreset",
    "q271_matched_att",
    "q272_diff_in_diff",
    "q273_bootstrap_ci",
    "q274_uplift_deciles",
    "q275_local_clustering",
    "q276_rake_keyphrases",
    "q277_calibration_error",
    "q278_cuped_adjust",
    "q279_median_of_means",
    "q280_balance_smd",
    "q281_rfm_segments",
    "q282_within_estimator",
    "q283_stream_ewma",
    "q284_logrank_test",
    "q285_quantile_effects",
    "q286_mann_kendall",
    "q287_moore_lewis",
    "q288_association_rules",
    "q289_markov_accuracy",
    "q290_window_sweep",
    "q291_forecast_backtest",
    "q292_coldstart_audit",
    "q293_burstiness",
    "q294_readability",
    "q295_bmp_decode",
    "q296_folder_glob_scan",
    "q297_png_decode",
    "q298_wav_energy",
    "q299_jpeg_decode",
    "q300_gif_frames",
    "q301_webdataset_shard",
    "q302_webdataset_samples",
    "q303_unicode_normalize",
    "q304_compressed_text",
    "q305_quality_classifier",
    "q306_video_frames",
    "q307_progressive_jpeg",
    "q308_color_jpeg",
    "q309_image_neardup",
    "q310_snappy_roundtrip",
    "q311_zstd_roundtrip",
    "q312_zstd_pure_decode",
    "q313_warc_records",
    "q314_html_extract",
    "q315_zstd_ndjson_scan",
    "q316_token_shards_roundtrip",
    "q317_png_variants",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("node-etl-spark-bench")
    # warm the JVM, codegen, parquet reader, and Python/Arrow worker
    # pool so per-query timings measure steady-state engine
    # performance, not one-time session startup (the daemon fork +
    # Arrow init otherwise lands on whichever query first uses a
    # Pandas UDF)
    spark.range(1).count()

    def _warm_gen(batches):
        yield from batches

    spark.range(100000).repartition(64).mapInPandas(_warm_gen, "id long").count()
    from node_etl_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()

    # best-of-2 per query: a single pass is hostage to co-tenant CPU
    # noise and first-touch cache effects; the min is the steady-state
    # engine cost
    def clear_blocks() -> None:
        # iterative operators (connected components, pagerank, BFS)
        # localCheckpoint/persist per round; those blocks are only
        # reclaimed when the JVM GCs the RDD handles. Left alone they
        # pile up across the suite until storage eviction kicks in —
        # and an evicted localCheckpoint block is unrecoverable
        # (lineage was truncated), surfacing as task retries and
        # wildly noisy timings. Each query starts from a clean slate.
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # optional subset (comma-separated full names or qNN prefixes):
    # scale-decade runs re-measure a handful of queries on much
    # larger data, where running the full suite would be wasteful
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    headline = HEADLINE
    if only_env:
        want = {w.strip() for w in only_env.split(",") if w.strip()}
        headline = [
            n for n in HEADLINE
            if n in want or n.split("_", 1)[0] in want
        ]
    timings: dict[str, float] = {}
    for name in headline:
        q = QUERIES.get(name)
        if q is None:
            continue
        best = None
        for _ in range(runs):
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            clear_blocks()
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    # the driver records only the LAST ~2000 chars of output; emit the
    # queries dict under short keys ("q01", "q122", ...) with compact
    # separators. Sorted ASCENDING by seconds (verdict r9 ask #5): the
    # tail window keeps the END of the line, so the slowest (hot-set)
    # queries go last and survive any truncation length — BENCH_r09
    # lost q01-q174's timings because registration order put them first
    short = {
        name.split("_", 1)[0]: secs
        for name, secs in sorted(timings.items(), key=lambda kv: kv[1])
    }
    # fixed-work CPU calibration (hash+sum over 100M longs, best of
    # 3): round-over-round suite comparisons span VM instances whose
    # raw speed varies by tens of percent; dividing by calib_sec
    # separates engine changes from machine changes
    calib = None
    for _ in range(3):
        t0 = time.time()
        # modulo keeps the exact ANSI sum inside int64 (raw xxhash64
        # values are uniform over the full long range and overflow)
        spark.range(100_000_000).selectExpr(
            "sum(xxhash64(id) % 1000003) AS s"
        ).collect()
        dt = time.time() - t0
        calib = dt if calib is None else min(calib, dt)
    # second probe (r8 verdict ask #5): the JVM-only probe above does
    # not track Python-worker throughput, so cross-box comparisons of
    # pandas_udf-heavy queries produced phantom regressions (r8's
    # +13.6% artifact delta that an on-box A/B disproved). Round-trip
    # a fixed numpy workload through Arrow + a Spark Python worker —
    # best of 3 after one warm-up (worker fork + Arrow init is
    # one-time cost, not steady-state throughput)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _calib_py(v):  # pragma: no cover - bench-only probe
        import numpy as np

        x = v.to_numpy(dtype="float64")
        acc = np.zeros_like(x)
        for _ in range(50):
            acc = np.sqrt(acc + x * 1.0000001)
        import pandas as _pd

        return _pd.Series(acc)

    calib_py = None
    probe = spark.range(2_000_000).selectExpr("CAST(id AS DOUBLE) AS x")
    for i in range(4):
        t0 = time.time()
        probe.select(_calib_py("x").alias("y")).selectExpr(
            "sum(y) AS s"
        ).collect()
        dt = time.time() - t0
        if i == 0:
            continue  # warm-up: python worker fork + Arrow setup
        calib_py = dt if calib_py is None else min(calib_py, dt)
    # key order matters: the driver's BENCH artifact keeps only the
    # LAST ~2000 chars of stdout, so the headline total and calibration
    # must come AFTER the (long) queries dict or they get truncated
    # away (r6's artifact lost "value" exactly this way)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "unit": "sec",
                "sf": sf,
                "queries": short,
                "n_queries": len(short),
                "calib_sec": round(calib, 3),
                "calib_pyworker_sec": round(calib_py, 3),
                "value": total,
            },
            separators=(",", ":"),
        )
    )
    # ...and a final SHORT line that is complete, parseable JSON well
    # inside any tail window, so the headline number always survives.
    # Distinct metric name + summary flag (round-8 ADVICE): a consumer
    # parsing by metric key must never double-count the two lines
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds_summary",
                "summary": True,
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(short),
                "calib_sec": round(calib, 3),
                "calib_pyworker_sec": round(calib_py, 3),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
