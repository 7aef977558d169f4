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
# ROUND-5 WINDOW (executing the rotation VERDICT r4 task #1 documents):
# positions 0-19 are the 20 fourth-round-4-window queries that have never
# had a driver row (r52_ewma .. x5_hash_embed); 20-24 are the five
# round-1-stale x2 rows (x2_minhash_lsh_pairs .. x2_simhash_pairs);
# 25-49 are 25 of the ROUND-5 additions (x1_span_dedup_sorted ..
# x8_did) — exactly the 50-row window; the stale-green displaced
# round-2/3 backlog holds at its round-2/3 record one more round. All 50 are locally driver-strict green (tools/check_oracle.py
# at sf0.01, full-set runs this round).
#
# ROUND-6 FRONT-LOAD (documented now so the next context executes it):
# the displaced round-2/3 backlog in list order below, from
# x3_ann_topk_lsh through x2_minhash_est (42 rows), then
# any round-6 additions; everything later holds a round-4 green. After
# round 6 no declared query's latest driver row predates round 3.
_PRIORITY = [
    # (1) fourth round-4 window — never driver-checked (20)
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
    # (2) round-1-stale x2 rows (5)
    "x2_minhash_lsh_pairs",
    "x2_minhash_signatures",
    "x2_ngram_jaccard_pairs",
    "x2_simhash",
    "x2_simhash_pairs",
    # (3) NEW IN ROUND 5 — inserted here as they land (no driver row)
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
    # ROUND-5 additions PAST the 50-row window (round-6 front-load head):
    "t8_roundtrip_xlsx",
    "x8_sprt",
    "x12_freshness",
    "t9_compaction",
    # (4) displaced round-2/3 backlog (round-4 ordering preserved)
    "x3_ann_topk_lsh",
    "x3_ivf_topk",
    "x6_media_meta",
    "x2_embedding_near_dup",
    "x2_cross_split_contamination",
    "x8_stratified_sample",
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
    "x10_clean_corpus",
    "x5_lm_score",
    "x2_minhash_est",
    # (5) round-4 driver window — freshest greens, lowest priority (50)
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
