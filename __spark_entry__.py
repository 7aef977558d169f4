"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (R3, TPC-H Q1 shape) on sf0.001.
queries()      -> every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame.
oracle_sql()   -> matching DuckDB SQL per query (omitted only for
                  genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from diepy_spark.plans.relational import RELATIONAL_QUERIES, r3_hash_aggregate
from diepy_spark.plans.oracles import RELATIONAL_ORACLES
from diepy_spark.plans.extended import EXTENDED_QUERIES, EXTENDED_ORACLES
from diepy_spark.plans.pipeline import PIPELINE_QUERIES, PIPELINE_ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return r3_hash_aggregate(spark, "/root/testdata/sf0.001")


# The driver's correctness harness records the FIRST 50 entries of
# queries() in insertion order.
#
_PRIORITY = [
    # ROUND-6 WINDOW (executing the rotation VERDICT r5 task #1 orders):
    # positions 0-3 the four past-window round-5 queries (judge-green,
    # never driver-checked); 4-49 the first 46 of the 49 round-2-stale
    # displaced backlog rows — exactly the 50-row window. All 50 are
    # locally driver-strict green (tools/check_oracle.py at sf0.01).
    #
    # ROUND-7 FRONT-LOAD — run `python tools/window_report.py` at round
    # start to GENERATE this from CORRECTNESS_r06 (VERDICT r5 #8: no
    # more hand-counting). Expected shape: the FIRST 50 of the 67
    # round-6 additions in section (4) below (no driver row) fill the
    # entire window; the last 17 (the RQ arc + the suffix-array/KS/
    # HyperBall/QTE/HITS batch + the stats/walk closers ACF/runs-test/
    # ANOVA/Wasserstein/random-walks/node2vec/walk-cooccur/walk-PMI)
    # spill to round 8
    # together with the displaced round-2/3 rows (x10_clean_corpus,
    # x5_lm_score, x2_minhash_est, x2_embedding_near_dup,
    # x2_cross_split_contamination, x8_stratified_sample) and round-7
    # additions — the rotation stays ~4-5 deep by design with a 50-row
    # window over 269 queries, and the judge's full check_oracle run
    # covers the rest each round.
    #
    # (1) past-window round-5 additions — never driver-checked (4)

    "t8_roundtrip_xlsx",
    "x8_sprt",
    "x12_freshness",
    "t9_compaction",
    # (2) round-2-stale displaced backlog, first 46 (window 4-49)
    "x3_ann_topk_lsh",
    "x3_ivf_topk",
    "x6_media_meta",
    "r1_scan_projection",
    "r2_filter",
    "r3_hash_aggregate",
    "r4_join3_aggregate",
    "r5_left_outer_join",
    "r6_semi_join",
    "r7_anti_join",
    "r8_topk",
    "r9_distinct",
    "x6_frame_sample",
    "x6_features",
    "x6_resize",
    "x7_stream_tumbling",
    "x7_stream_sliding",
    "x7_stream_sessions",
    "x7_stream_stateful",
    "x7_stream_dedup",
    "x7_stream_enrich",
    "t1_roundtrip_csv",
    "r28b_histogram_quantiles",
    "x2_dedup_apply",
    "x2_dedup_stats",
    "x2_embedding_near_dup_lsh",
    "x3_cosine_topk",
    "x5_lang_id",
    "x5_token_stats",
    "x5_quality_score",
    "x5_winnow",
    "x5_vocab",
    "x5_tfidf",
    "x3_label_centroids",
    "x8_hash_split",
    "x8_hash_sample",
    "x8_weighted_sample",
    "x8_grouped_linfit",
    "x9_merge_upsert",
    "x5_repetition",
    "x5_pii_redact",
    "x2_contamination",
    "x2_winnow_pairs",
    "x8_hll_distinct",
    "x5_chunk_pack",
    "x3_quantize_int8",
    # ROUND-7 FRONT-LOAD HEAD (past the 50-row window this round):
    # (3) last 3 round-2-stale rows, then the 3 round-3 rows
    "x10_clean_corpus",
    "x5_lm_score",
    "x2_minhash_est",
    "x2_embedding_near_dup",
    "x2_cross_split_contamination",
    "x8_stratified_sample",
    # (4) ROUND-6 additions — inserted here as they land (no driver row)
    "x5_bpe_train",
    "r57_window_navigation",
    "x12_fd_discovery",
    "x12_dup_keys",
    "x8_mann_kendall",
    "x8_cusum",
    "x11_ppr",
    "x3_kmeans_stability",
    "x2_lsh_bucket_health",
    "x5_bpe_apply",
    "t10_schema_evolution",
    "x8_jackknife",
    "x10_dataset_card",
    "x9_takedown",
    "x5_readability",
    "x3_range_query",
    "r58_rank_functions",
    "x7_stream_takedown",
    "x8_fdr_bh",
    "x12_mutual_info",
    "x5_zipf",
    "x10_epoch_plan",
    "x7_stream_late",
    "x1_bloom_dedup",
    "x7_stream_late_audit",
    "x7_stream_resume",
    "x12_volume_anomaly",
    "x1_cms_span_dedup",
    "x8_delta_method",
    "x7_stream_hll",
    "x3_filtered_ann",
    "x9_cdc_apply",
    "x8_tost",
    "x12_psi",
    "x3_embedding_drift",
    "x2_cross_source_pairs",
    "x3_pq_distortion",
    "x2_dedup_savings",
    "x10_pipeline_funnel",
    "x6_media_pack",
    "x5_regex_tokens",
    "x9_retention_plan",
    "x11_cc_twophase",
    "x11_degree_dist",
    "x12_gini",
    "x6_frame_dedup",
    "x7_stream_psi",
    "x2_semdedup_sweep",
    "x10_mix_rebalance",
    "x7_stream_quantiles",
    "x3_rq_distortion",
    "x3_rq_adc",
    "x3_pq_vs_rq_recall",
    "x3_pq_trained_distortion",
    "x1_suffix_array",
    "x8_ks_test",
    "x11_hyperball",
    "x8_qte",
    "x11_hits",
    "x8_acf",
    "x8_runs_test",
    "x8_anova",
    "x11_random_walks",
    "x11_node2vec",
    "x11_walk_cooccur",
    "x11_walk_pmi",
    "x8_wasserstein",
    # (5) round-4 driver window — round-4 greens (50)
    "x3_ivf_trained",
    "t4_roundtrip_orc",
    "x12_outliers",
    "x5_gopher",
    "x11_label_prop",
    "x3_pq_adc",
    "r51_unpivot",
    "x8_temperature_mix",
    "x7_stream_outliers",
    "x2_dedup_best",
    "x1_incremental_dedup",
    "x12_ref_integrity",
    "x8_ab_test",
    "x11_kcore",
    "x9_rollup_cascade",
    "x1_span_dedup",
    "x1_span_strip",
    "x5_lang_classify",
    "x5_shard_pack",
    "r45_cohort_retention",
    "r46_market_basket",
    "x8_bloom_semijoin",
    "x9_snapshot_diff",
    "x11_triangle_count",
    "x2_fuzzy_join",
    "x12_dq_profile",
    "r47_funnel",
    "x8_cms_heavy_hitters",
    "x9_incremental_agg",
    "r48_transitions",
    "x3_knn_classify",
    "x9_scd2",
    "x12_skew_diag",
    "x1_cdc_chunks",
    "x8_cms_join_size",
    "x12_drift",
    "t3_roundtrip_parquet",
    "x7_stream_upsert",
    "x12_gaps",
    "x8_bootstrap_ci",
    "x3_kmeans",
    "x8_weighted_topk",
    "r49_rolling_dau",
    "x2_containment_pairs",
    "x8_kmv_overlap",
    "r50_equidepth_binning",
    "x6_media_dedup",
    "x7_stream_topk",
    "x2_lsh_curve",
    "x3_ann_recall",
    # (6) round-5 driver window — freshest greens, lowest priority (50)
    "r52_ewma",
    "x8_cuped",
    "x8_mwu",
    "r53_dist_windows",
    "x8_srm",
    "x2_semdedup",
    "x11_bfs",
    "x5_ppl_buckets",
    "x9_scd2_lookup",
    "x7_stream_ewma",
    "x11_assortativity",
    "x8_perm_test",
    "t5_roundtrip_nested",
    "x2_semdedup_apply",
    "x8_trimmed_mean",
    "r54_mode",
    "x12_benford",
    "x2_cluster_size_dist",
    "x7_stream_cluster_assign",
    "x5_hash_embed",
    "x2_minhash_lsh_pairs",
    "x2_minhash_signatures",
    "x2_ngram_jaccard_pairs",
    "x2_simhash",
    "x2_simhash_pairs",
    "x1_span_dedup_sorted",
    "x2_semdedup_probe",
    "x12_salted_join",
    "x5_lang_confusion",
    "r55_weighted_median",
    "r56_trailing_range_window",
    "x3_mips",
    "x11_neighbor_jaccard",
    "x3_ivfpq",
    "x2_incremental_minhash",
    "x10_training_corpus",
    "x12_key_discovery",
    "x12_correlation",
    "x8_power_mde",
    "t6_bucketed_join",
    "x5_ngram_novelty",
    "x12_seasonality",
    "x1_chunk_dedup_ratio",
    "x5_bpe_pairs",
    "x12_entropy",
    "t7_write_audit_publish",
    "x7_stream_ingest",
    "x11_modularity",
    "x3_cluster_purity",
    "x8_did",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(RELATIONAL_QUERIES)
    merged.update(EXTENDED_QUERIES)
    merged.update(PIPELINE_QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _PRIORITY:
        if name in merged:
            out[name] = merged[name]
    for name, fn in merged.items():
        if name not in out:
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(EXTENDED_ORACLES)
    out.update(PIPELINE_ORACLES)
    return out
