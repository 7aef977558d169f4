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


def freq_median(
    df: DataFrame,
    group_col: str,
    val_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """(group_col, med): exact LOWER median (element at position
    ceil(n/2) of the sorted values — no interpolation, stays integer) of
    an integer column per group, via the value-frequency histogram.

    Plan: one shuffle to (group, value) counts with map-side combine,
    then cumulative windows over frames of |distinct values| rows. The
    deterministic lower-median (vs the interpolated (a+b)/2 midpoint)
    is what keeps every downstream deviation integer-exact.

    weight_col (r13, the cms_cells weight precedent): compute from
    PRE-AGGREGATED (group, value, count) rows instead of raw rows — the
    histogram is then sum(weight), bit-identical to the unweighted call
    over the expanded rows (a value with multiplicity w contributes w to
    its frequency either way). Lets a caller that already holds the
    value-frequency table (or a derived one, e.g. |v - med|) reuse it
    instead of re-scanning the corpus."""
    if weight_col is None:
        h = df.groupBy(group_col, val_col).agg(
            F.count(F.lit(1)).alias("c")
        )
    else:
        h = df.groupBy(group_col, val_col).agg(
            F.sum(weight_col).cast("bigint").alias("c")
        )
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


def freq_quantile_cont_multi(
    df: DataFrame,
    group_col: str,
    metrics: dict[str, tuple[str, float]],
    mean_cols: dict[str, str] | None = None,
) -> DataFrame:
    """(group_col, <one column per metrics key>): several exact
    interpolated percentiles — possibly over DIFFERENT value columns and
    DIFFERENT q — in ONE corpus pass: the rows melt to (group, metric,
    value) (a narrow Generate), ONE frequency shuffle and ONE distributed
    block running sum cover every metric, and a conditional final
    aggregate pivots the results back to columns. Same bit-exact
    interpolation contract as freq_quantile_cont; ~metrics-count cheaper
    than calling it per metric (each call re-scans and re-shuffles).

    r13 (guide §2.3 "aggregate before you shuffle"): the per-(group,
    metric) row count n is SUM(c) of the frequency table (a value with
    multiplicity c contributes c rows), so it is computed from freq —
    distinct-value-sized — instead of a second aggregate over the full
    melted corpus; one corpus pass total.

    mean_cols (r13): {out_name: metric_name} — also emit the MEAN of the
    named metric, computed from the frequency table as
    sum(v*c)/sum(c). Bit-identical to avg() over the raw rows whenever
    every value and every partial product is exactly representable in a
    double (integral value grids — the r28 l_quantity case); for
    arbitrary float inputs avg()'s accumulation order differs and the
    caller must not assume bit equality.

    Divergence from `percentile()` to know (ADVICE r12): a group whose
    values are ALL NULL has no frequency rows here and drops from the
    output entirely, where `percentile()` would emit the group with a
    NULL result. Callers needing that contract must LEFT-join from the
    group universe (as plans/relational.r28_percentiles does)."""
    import re as _re

    from diepy_spark.operators.suffixes import block_running_sum

    # metric names are spliced into SQL CASE arms and become output
    # column aliases — identifier-only, or a quote breaks parsing
    for name in metrics:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"metric name {name!r} must be a bare identifier "
                "([A-Za-z_][A-Za-z0-9_]*)"
            )
    mean_cols = mean_cols or {}
    for out_name, metric_name in mean_cols.items():
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", out_name):
            raise ValueError(
                f"mean column name {out_name!r} must be a bare identifier"
            )
        if metric_name not in metrics:
            raise ValueError(
                f"mean_cols metric {metric_name!r} not in metrics"
            )
        if out_name in metrics:
            raise ValueError(
                f"mean column name {out_name!r} collides with a metric"
            )

    g = group_col
    melted = df.select(
        g,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("__m"),
                        F.col(col).cast("double").alias("__v"),
                    )
                    for name, (col, _q) in metrics.items()
                ]
            )
        ).alias("__mv"),
    ).select(g, F.col("__mv.__m").alias("__m"), F.col("__mv.__v").alias("__v"))
    rows = melted.where(F.col("__v").isNotNull())
    freq = rows.groupBy(g, "__m", "__v").agg(F.count(F.lit(1)).alias("__c"))
    # composite partition key: block_running_sum groups by ONE column — a
    # STRUCT key (field-wise equality/ordering) rather than a delimiter
    # concat, which could collide on group values containing the
    # delimiter and collapses a NULL group to the bare metric name
    # lineage cut on the distinct-value-sized frequency table: both the
    # running sum and the n/mean aggregate below read its blocks, so the
    # melted corpus is scanned and shuffled exactly ONCE (r13 — the old
    # plan re-aggregated the full melted corpus a second time for n)
    freq = freq.withColumn(
        "__gm", F.struct(F.col(g), F.col("__m"))
    ).localCheckpoint(eager=False)
    cum = block_running_sum(freq, "__gm", ["__v"], "__c", out="__cum")
    # n == sum of value multiplicities; the mean numerator sum(v*c) is
    # exact whenever v*c and the running total are exactly representable
    # in a double (integral grids — see mean_cols in the docstring)
    n_aggs = [F.sum("__c").alias("__n")]
    if mean_cols:
        # only when a mean is requested (ADVICE r13): the numerator is
        # an unused aggregate column for every quantile-only caller
        n_aggs.append(F.sum(F.col("__v") * F.col("__c")).alias("__sv"))
    n = freq.groupBy(g, "__m").agg(*n_aggs)
    qcase = "CASE __m " + " ".join(
        f"WHEN '{name}' THEN CAST({float(q)} AS DOUBLE)"
        for name, (_c, q) in metrics.items()
    ) + " END"
    j = (
        cum.join(F.broadcast(n), [g, "__m"])
        .withColumn("__pos", F.expr(qcase) * (F.col("__n") - 1))
        .withColumn("__lo", F.expr("CAST(floor(__pos) AS BIGINT) + 1"))
        .withColumn("__hi", F.expr("CAST(ceil(__pos) AS BIGINT) + 1"))
    )
    picked = j.where(
        (F.col("__cum") >= F.col("__lo"))
        & (F.col("__cum") - F.col("__c") < F.col("__hi"))
    )
    def _interp(m: str) -> str:
        vlo = (f"max(CASE WHEN __m = '{m}' AND __cum >= __lo"
               f" AND __cum - __c < __lo THEN __v END)")
        vhi = (f"max(CASE WHEN __m = '{m}' AND __cum >= __hi"
               f" AND __cum - __c < __hi THEN __v END)")
        lo = f"max(CASE WHEN __m = '{m}' THEN __lo END)"
        hi = f"max(CASE WHEN __m = '{m}' THEN __hi END)"
        pos = f"max(CASE WHEN __m = '{m}' THEN __pos END)"
        return (
            f"CASE WHEN {lo} = {hi} THEN {vlo}"
            f" ELSE ({hi} - 1 - {pos}) * ({vlo})"
            f" + ({pos} - {lo} + 1) * ({vhi}) END"
        )
    mean_aggs = [
        F.expr(
            f"max(CASE WHEN __m = '{metric_name}' THEN __sv END)"
            f" / max(CASE WHEN __m = '{metric_name}' THEN __n END)"
        ).alias(out_name)
        for out_name, metric_name in mean_cols.items()
    ]
    return picked.groupBy(g).agg(
        *[F.expr(_interp(name)).alias(name) for name in metrics],
        *mean_aggs,
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
    # lineage cut: the running sum and the n aggregate both read the
    # distinct-value-sized frequency blocks — one corpus pass (r13)
    freq = freq.localCheckpoint(eager=False)
    cum = block_running_sum(freq, g, ["__v"], "__c", out="__cum")
    # n == sum of value multiplicities (count of non-null raw rows)
    n = freq.groupBy(g).agg(F.sum("__c").alias("__n"))
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
