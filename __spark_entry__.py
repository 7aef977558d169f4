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
# queries() in insertion order.  Round 1 proved R1-R40 + the first ten
# X-entries green (CORRECTNESS_r01.json); this priority list front-loads
# the families that have not yet earned a driver row (x3/x5/x6/x7/x8,
# t1_roundtrip, the formerly oracle-less embedding-LSH entry) plus the
# queries new in round 2, so they land inside the checked window.
# Everything not named here follows in its module's natural order and
# keeps its round-1 green row as the standing record.
_PRIORITY = [
    # round-1 declared but driver-unchecked (19)
    "x3_cosine_topk",
    "x3_ann_topk_lsh",
    "x3_ivf_topk",
    "x5_lang_id",
    "x5_token_stats",
    "x5_quality_score",
    "x5_winnow",
    "x6_media_meta",
    "x6_frame_sample",
    "x6_features",
    "x6_resize",
    "x7_stream_tumbling",
    "x7_stream_sliding",
    "x7_stream_sessions",
    "x7_stream_stateful",
    "x7_stream_dedup",
    "x8_hash_split",
    "x8_hash_sample",
    "t1_roundtrip_csv",
    # round-1 row existed but was no_oracle; round 2 adds a real oracle
    "x2_embedding_near_dup_lsh",
    # new in round 2
    "x2_dedup_apply",
    "x2_dedup_stats",
    "r28b_histogram_quantiles",
    "x5_vocab",
    "x5_tfidf",
    "x3_label_centroids",
    "x8_weighted_sample",
    "x8_grouped_linfit",
    "x9_merge_upsert",
    "r41_map_functions",
    "x5_repetition",
    "x5_pii_redact",
    "x2_contamination",
    "x2_winnow_pairs",
    "x8_hll_distinct",
    "x5_chunk_pack",
    "x3_quantize_int8",
    "x7_stream_enrich",
    "x10_clean_corpus",
    "x5_lm_score",
    "x2_minhash_est",
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
