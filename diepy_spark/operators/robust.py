"""Robust statistics over integer-valued columns (SURVEY §2.6 X12
data-quality surface): exact medians and median-absolute-deviation
outlier flags WITHOUT per-group value buffering.

The scale trick: for bounded integer domains (money in cents, counts,
quantized measurements), the exact median is computable from the VALUE
FREQUENCY table — groupBy (group, value) count, cumulative window, pick
the first value whose cumulative count reaches ceil(n/2). Aggregation
state is bounded by the number of DISTINCT values per group (≤ domain
size, e.g. ~10^6 for cents), never by the row count — unlike
`percentile()`, which buffers every row of the group in one aggregation
buffer (the r28 scale-killer this module exists to avoid).

Everything here is integer arithmetic end to end, so results are
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def freq_median(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """(group_col, med): exact LOWER median (element at position
    ceil(n/2) of the sorted values — no interpolation, stays integer) of
    an integer column per group, via the value-frequency histogram.

    Plan: one shuffle to (group, value) counts with map-side combine,
    then cumulative windows over frames of |distinct values| rows. The
    deterministic lower-median (vs the interpolated (a+b)/2 midpoint)
    is what keeps every downstream deviation integer-exact."""
    h = df.groupBy(group_col, val_col).agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy(group_col).orderBy(val_col)
    wall = Window.partitionBy(group_col)
    w = h.select(
        group_col,
        val_col,
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    return (
        w.where(F.col("cum") >= F.expr("(n + 1) DIV 2"))
        .groupBy(group_col)
        .agg(F.min(val_col).alias("med"))
    )


def freq_quantile_cont(
    df: DataFrame, group_col: str, val_col: str, q: float, out: str = "q"
) -> DataFrame:
    """(group_col, out): exact INTERPOLATED percentile — percentile_cont /
    Spark `percentile()` semantics, bit-identical interpolation weights
    ((higher - pos) * v_lo + (pos - lower) * v_hi, Spark's Percentile
    formula) — per group, WITHOUT per-group value buffering.

    Scale shape: percentile()'s aggregation buffer holds every row of the
    group (the r28 scale-killer); here state is the VALUE FREQUENCY table
    — one shuffle to (group, value) counts with map-side combine, then a
    distributed block running sum (operators/suffixes.block_running_sum:
    range-partitioned, never a group-sized window) for cumulative counts,
    a broadcast of per-group row counts, and a 2-rows-per-group final
    aggregate. Bounded by the distinct-value domain (a decimal grid
    saturates at scale), never the row count. NULLs are ignored, matching
    percentile()/quantile_cont."""
    from diepy_spark.operators.suffixes import block_running_sum

    g = group_col
    rows = df.where(F.col(val_col).isNotNull()).select(
        g, F.col(val_col).cast("double").alias("__v")
    )
    freq = rows.groupBy(g, "__v").agg(F.count(F.lit(1)).alias("__c"))
    cum = block_running_sum(freq, g, ["__v"], "__c", out="__cum")
    n = rows.groupBy(g).agg(F.count(F.lit(1)).alias("__n"))
    j = (
        cum.join(F.broadcast(n), g)
        # pos is the 0-based fractional index q*(n-1); __lo/__hi are the
        # 1-based ranks of the two bracketing order statistics
        .withColumn("__pos", F.lit(float(q)) * (F.col("__n") - 1))
        .withColumn("__lo", F.expr("CAST(floor(__pos) AS BIGINT) + 1"))
        .withColumn("__hi", F.expr("CAST(ceil(__pos) AS BIGINT) + 1"))
    )
    picked = j.where(
        (F.col("__cum") >= F.col("__lo"))
        & (F.col("__cum") - F.col("__c") < F.col("__hi"))
    )
    vlo = "max(CASE WHEN __cum >= __lo AND __cum - __c < __lo THEN __v END)"
    vhi = "max(CASE WHEN __cum >= __hi AND __cum - __c < __hi THEN __v END)"
    return picked.groupBy(g).agg(
        F.expr(
            f"CASE WHEN max(__lo) = max(__hi) THEN {vlo}"
            f" ELSE (max(__hi) - 1 - max(__pos)) * ({vlo})"
            f" + (max(__pos) - max(__lo) + 1) * ({vhi}) END"
        ).alias(out)
    )


def robust_outliers(
    df: DataFrame, group_col: str, val_col: str, k: int = 5
) -> DataFrame:
    """Per-group robust outlier summary by the median/MAD rule: a row is
    an outlier when |x - median| > k * MAD (MAD = lower-median of the
    absolute deviations). Median-based detection survives the outliers
    themselves — mean/stddev z-scores do not (one 10^9 glitch drags the
    mean; the median doesn't move). Degeneracy to know: when more than
    half a group sits on one value, MAD = 0 and EVERY other value flags
    (k * 0 = 0) — the strictest consistent reading of the rule; callers
    with near-constant groups should pre-filter or check `mad` > 0.

    Output: (group_col, n, med, mad, n_out, max_dev) — all exact
    integers. Plan shape: two freq_median passes (each one bounded-state
    shuffle) whose tiny results BROADCAST back onto the fact scan; the
    final pass is one map-side-combined aggregate. Three narrow scans of
    the fact table, no wide shuffle anywhere."""
    med = freq_median(df, group_col, val_col)
    d = df.join(F.broadcast(med), group_col).withColumn(
        "dev", F.abs(F.col(val_col) - F.col("med"))
    )
    mad = freq_median(d, group_col, "dev").withColumnRenamed("med", "mad")
    j = d.join(F.broadcast(mad), group_col)
    is_out = F.col("dev") > F.lit(k) * F.col("mad")
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_out"),
        F.max("dev").alias("max_dev"),
    )
