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
