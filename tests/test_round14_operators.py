"""Round-14 optimization equivalence pins.

1. adjacency_arrays is order-isomorphic to the old row_number idx
   ladder: element_at(nbrs, i) must equal the dst-ordered adjacency row
   with idx = i for every (src, i) — the argument both walk builders'
   r14 re-plan rests on.
2. The shared session value-frequency artifact (_ev_vhist_cached) rolls
   up EXACTLY to every per-query histogram shape the nine converted x8
   tests used to build from their own events scan.
"""

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from diepy_spark.session import get_spark

    s = get_spark("test-round14")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_adjacency_arrays_match_row_number_ladder(spark):
    from diepy_spark.operators.clustering import adjacency_arrays

    # a small random-ish graph with skewed degrees and both directions
    rows = [(a, b) for a in range(1, 30) for b in range(1, 30)
            if a != b and (a * 31 + b * 7) % 5 < 2]
    e = spark.createDataFrame(rows, "src bigint, dst bigint").distinct()
    arr = {r["src"]: r["nbrs"] for r in adjacency_arrays(e).collect()}
    ladder = e.withColumn(
        "idx",
        F.row_number().over(Window.partitionBy("src").orderBy("dst")),
    ).collect()
    assert ladder, "empty graph"
    for r in ladder:
        assert arr[r["src"]][r["idx"] - 1] == r["dst"], (r["src"], r["idx"])
    # array covers nothing beyond the ladder
    assert sum(len(v) for v in arr.values()) == len(ladder)


def test_ev_vhist_rollups_match_direct_histograms(spark):
    from diepy_spark.plans.extended import _ev_vhist_cached, load_table

    hist = _ev_vhist_cached(spark, SF)
    ev = load_table(spark, SF, "events").where(F.col("value").isNotNull())
    base = ev.selectExpr(
        "event_type",
        "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS par",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # (cents, parity) — the mwu/ks/wasserstein/qte shape
    got = hist.groupBy("cents", "par").agg(F.sum("cnt").alias("c"))
    want = base.groupBy("cents", "par").agg(F.count(F.lit(1)).alias("c"))
    assert rows(got) == rows(want)
    # (event_type, cents) — the kruskal/levene/mood/trimmed/auc shape
    got = hist.groupBy("event_type", "cents").agg(F.sum("cnt").alias("c"))
    want = base.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    assert rows(got) == rows(want)
    # grand totals
    assert hist.agg(F.sum("cnt")).collect()[0][0] == ev.count()


def test_freq_quantile_multi_mean_cols_match_avg_on_integral_grid(spark):
    # ADVICE r13: mean_cols derives the mean from the value-frequency
    # table as sum(v*c)/sum(c) — on an integral value grid (l_quantity)
    # this must be BIT-identical to avg() over the raw rows.
    from diepy_spark.operators.robust import freq_quantile_cont_multi
    from diepy_spark.plans.extended import load_table

    li = load_table(spark, SF, "lineitem")
    got = {
        r["l_returnflag"]: r["avg_qty"]
        for r in freq_quantile_cont_multi(
            li,
            "l_returnflag",
            {"mq": ("l_quantity", 0.5)},
            mean_cols={"avg_qty": "mq"},
        ).collect()
    }
    want = {
        r["l_returnflag"]: r["a"]
        for r in li.groupBy("l_returnflag")
        .agg(F.avg(F.col("l_quantity").cast("double")).alias("a"))
        .collect()
    }
    assert got == want and got
    # the integral-grid precondition the equivalence rests on
    frac = li.where("l_quantity != floor(l_quantity)").count()
    assert frac == 0


def test_freq_quantile_multi_without_mean_cols_unchanged(spark):
    # ADVICE r13: quantile-only callers must see identical results (and
    # no stray mean column) now that __sv is built conditionally.
    from diepy_spark.operators.robust import (
        freq_quantile_cont,
        freq_quantile_cont_multi,
    )
    from diepy_spark.plans.extended import load_table

    li = load_table(spark, SF, "lineitem")
    multi = freq_quantile_cont_multi(
        li, "l_returnflag", {"mq": ("l_quantity", 0.5)}
    )
    assert multi.columns == ["l_returnflag", "mq"]
    single = freq_quantile_cont(
        li.withColumn("__d", F.col("l_quantity").cast("double")),
        "l_returnflag", "__d", 0.5, out="mq",
    )
    assert sorted(map(tuple, multi.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_corpus_funnel_clean_param_matches_internal_path(spark):
    # ADVICE r13: corpus_funnel(clean=clean_corpus(...)) at the SAME
    # thresholds must equal the internal-path funnel row for row, and
    # stage doc counts must be monotonically non-increasing (the
    # consistency guard for a mismatched clean frame).
    from diepy_spark.operators.corpus import clean_corpus, corpus_funnel
    from diepy_spark.plans.extended import (
        CLEAN_MAX_DUP3,
        CLEAN_MIN_SCORE,
        CLEAN_MIN_TOKENS,
        JACCARD_MAX_DF,
        JACCARD_THRESHOLD,
        _docs,
        _sdflags_cached,
    )

    docs = _docs(spark, SF)
    flags = _sdflags_cached(spark, SF).select(
        F.col("vec_id").alias("doc_id"), "is_dup"
    )
    kw = dict(
        min_tokens=CLEAN_MIN_TOKENS,
        min_score=CLEAN_MIN_SCORE,
        max_dup3=CLEAN_MAX_DUP3,
        jaccard_threshold=JACCARD_THRESHOLD,
        max_df=JACCARD_MAX_DF,
    )
    internal = sorted(map(tuple, corpus_funnel(docs, flags, **kw).collect()))
    cleaned = clean_corpus(docs, **kw)
    via_clean = sorted(
        map(tuple, corpus_funnel(docs, flags, clean=cleaned, **kw).collect())
    )
    assert internal == via_clean and internal
    docs_by_stage = [r[2] for r in sorted(via_clean)]
    assert docs_by_stage == sorted(docs_by_stage, reverse=True)
