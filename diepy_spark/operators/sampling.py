"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE sampling: the same row must land
in the same split on every run, on any cluster, regardless of partitioning
— which rules out `df.sample()`/`rand()` (partition-order dependent). The
standard trick is hashing a stable row identity into [0, 1) and thresholding.

Everything here is a narrow projection (no shuffle, no state): at 100 TB a
split assignment is a free column; a sample is a pushdown-friendly filter.
The hash→fraction arithmetic is `operators.sketch.hex_frac_sql`, shared
verbatim with the DuckDB oracles, so assignments are engine-portable and
bit-identical.

No reference analog (`/root/reference` has no sampling surface beyond the
20k-row inference cap, SURVEY.md §1.3); mandated by the north-star
extension set.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diepy_spark.operators.sketch import hex_frac_sql

__all__ = [
    "hash_frac",
    "hash_sample",
    "hash_split",
    "reservoir_per_group",
    "stratified_hash_sample",
    "temperature_mix",
    "weighted_hash_sample",
    "weighted_topk_sample",
]


def hash_frac(id_col: str, seed: str = "") -> "F.Column":
    """Column in [0, 1): stable uniform hash of `id_col` (any type; cast to
    string) salted with `seed`. Different seeds give independent samples.
    The md5 sub-expression appears once per nibble in the generated SQL;
    codegen's common-subexpression elimination evaluates it once per row."""
    if not re.fullmatch(r"[A-Za-z0-9_.\-]*", seed):
        raise ValueError(f"seed must be alphanumeric/._-: {seed!r}")
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", id_col):
        raise ValueError(f"id_col must be a plain identifier: {id_col!r}")
    md5_sql = f"md5(concat('{seed}:', CAST({id_col} AS STRING)))"
    return F.expr(hex_frac_sql(md5_sql))


_frac_expr = hash_frac


def hash_sample(df: DataFrame, id_col: str, fraction: float, seed: str = "") -> DataFrame:
    """Deterministic ~`fraction` sample: keeps rows whose hash fraction is
    below the threshold. Stable across runs/partitionings; disjoint seeds
    give independent samples; the filter is a plain predicate (prunable,
    pushdown-friendly)."""
    return df.where(_frac_expr(id_col, seed) < fraction)


def weighted_hash_sample(
    df: DataFrame, id_col: str, weight_col: str, scale: float, seed: str = ""
) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sample: row kept iff
    hash_frac(id) < weight/scale, i.e. inclusion probability
    min(1, weight/scale) — e.g. length-proportional document sampling
    (weight=n_chars) for a token-budgeted subcorpus. Rows with
    weight >= scale are always kept. Same reproducibility story as
    hash_sample: stable across runs, engines, and partitionings, and the
    predicate is narrow (prunes at the scan)."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", weight_col):
        raise ValueError(f"weight_col must be a plain identifier: {weight_col!r}")
    return df.where(_frac_expr(id_col, seed) < F.col(weight_col) / F.lit(float(scale)))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split: adds `split_col` assigning each row to a
    named bucket with the given weights (default 80/10/10 train/valid/test).
    Weight order follows dict insertion order; weights must sum to ~1."""
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    f = _frac_expr(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        clause = F.when(f < acc, name)
        expr = clause if expr is None else expr.when(f < acc, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic k-per-group sample: the k rows with the SMALLEST hash
    fraction per group (ties broken by id). Statistically this is a
    uniform without-replacement sample of k per group — the same guarantee
    classic reservoir sampling gives — but reproducible across runs,
    engines, and partitionings, because membership depends only on row
    identity, not arrival order.

    Output contract: the input columns plus ``rk`` (int, 1..k) — the
    row's rank within its group by (hash fraction asc, id asc). ``rk`` is
    part of the public surface (declared queries select it as the stable
    within-sample ordering); renaming it is a breaking change.

    Scale: one shuffle on the group key; the per-group top-k is a window
    with rank pushdown (Spark inserts a per-partition k-row limit before
    the exchange via WindowGroupLimit), so the shuffle carries at most
    k rows per (task, group) — never the whole group."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", group_col):
        raise ValueError(f"group_col must be a plain identifier: {group_col!r}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _frac_expr(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def stratified_hash_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    fractions: dict[str, float] | None = None,
    seed: str = "",
) -> DataFrame:
    """Deterministic STRATIFIED sample: each group is sampled at its own
    fraction. fractions=None equalizes strata — every group is sampled at
    min_group_count / its_count, the rebalancing step that flattens a
    skewed source/language mix before training. Explicit fractions give
    per-group rates (missing groups default to 1.0 = keep all).

    Same reproducibility contract as hash_sample (membership is a pure
    function of row identity), so resampling with the same seed on any
    cluster yields the same rows. Scale: the per-group fraction frame is
    |groups|-sized and broadcast; the filter stays a narrow predicate —
    no shuffle of the data being sampled."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", group_col):
        raise ValueError(f"group_col must be a plain identifier: {group_col!r}")
    if fractions is None:
        counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
        # min over a |groups|-row frame: a 1-row broadcast, not a collect
        min_cnt = counts.agg(F.min("_cnt").alias("_min_cnt"))
        fr = counts.crossJoin(F.broadcast(min_cnt)).select(
            group_col, (F.col("_min_cnt") / F.col("_cnt")).alias("_frac")
        )
    else:
        from pyspark.sql.types import DoubleType, StructField, StructType

        spark = df.sparkSession
        # key column typed FROM THE SOURCE SCHEMA — a hardcoded string key
        # against e.g. an int group column would join through implicit
        # casts (or match nothing); deriving the type makes the equi-join
        # exact for any group column type.
        key_type = df.schema[group_col].dataType
        fr = spark.createDataFrame(
            [(k, float(v)) for k, v in fractions.items()],
            StructType(
                [
                    StructField(group_col, key_type, nullable=True),
                    StructField("_frac", DoubleType(), nullable=False),
                ]
            ),
        )
    out = df.join(F.broadcast(fr), group_col, "left")
    return (
        out.where(_frac_expr(id_col, seed) < F.coalesce("_frac", F.lit(1.0)))
        .drop("_frac")
    )


# P(X <= k) for Poisson(lambda=1), k = 0..5; beyond caps at 6. repr()'d
# into SQL so Spark and DuckDB compare against bit-identical literals.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]


def poisson_weight_sql(u_sql: str) -> str:
    """SQL CASE mapping a uniform [0,1) expression to a Poisson(1) draw by
    inverse CDF (capped at 6). Identical text in Spark SQL and DuckDB."""
    branches = " ".join(
        f"WHEN {u_sql} < {POISSON1_CDF[k]!r} THEN {k}" for k in range(6)
    )
    return f"(CASE {branches} ELSE 6 END)"


def poisson_bootstrap_means(
    df: DataFrame,
    on: str,
    cents_col: str,
    id_col: str,
    b: int = 20,
    seed: str = "boot",
) -> DataFrame:
    """Poisson-bootstrap replicate means — THE one-pass distributed
    bootstrap (each replicate reweights every row by an independent
    Poisson(1) draw instead of resampling, so all B replicates compute in
    a single scan with ordinary map-side-combined aggregation; the
    with-replacement bootstrap would need B shuffled resamples).

    Determinism contract: the per-(row, replicate) draw inverts the
    Poisson CDF on a uniform derived from ``md5(seed || b || ':' || id)``
    (operators/sketch.py:hex_frac_sql), and each replicate mean is
    sum(weight*cents)/sum(weight) — exact integer sums, ONE final
    division — so replicate means are bit-identical in any engine and
    under any partitioning.

    Output: one row per (``on``, ``rep``) with ``boot_mean`` (double,
    cents / 100)."""
    from diepy_spark.operators.sketch import hex_frac_sql

    u = hex_frac_sql(
        f"md5(concat('{seed}', CAST(rep AS STRING), ':', CAST({id_col} AS STRING)))"
    )
    weighted = df.select(
        on,
        cents_col,
        id_col,
        F.explode(F.expr(f"sequence(0, {b - 1})")).alias("rep"),
    ).withColumn("w", F.expr(poisson_weight_sql(f"({u})")))
    return (
        weighted.groupBy(on, "rep")
        .agg(
            F.sum(F.col("w") * F.col(cents_col)).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .select(
            on,
            "rep",
            (F.col("swx").cast("double") / F.col("sw") / 100.0).alias("boot_mean"),
        )
    )


def weighted_topk_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wtk",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis–Spirakis A-ES algorithm (IPL 2006): each row draws
    u = hash_frac(id) and ranks by the key u^(1/w); the top-k keys are
    exactly a weight-proportional without-replacement sample. The
    Bernoulli sampler (weighted_hash_sample) can't deliver a FIXED
    sample size; this is the standard fix, and it's one narrow
    projection + one per-group top-k window (WindowGroupLimit prunes
    per-task) — no iterative draw-and-remove.

    Ranking uses the monotone-equivalent key ln(u)/w (maximizing
    u^(1/w) == maximizing ln(u)/w since ln(u) < 0), with the id as
    tie-break. Determinism: u is the md5-derived fraction (stable across
    engines/partitionings); ln is the one libm primitive here — both
    engines are within 1 ulp, and a rank flip would need two keys within
    1 ulp of each other, which the continuous hash makes negligible (and
    the cross-engine oracle would catch).

    Output: input columns + ``rk`` (1..k, the sample order). Rows with
    non-positive weight are excluded (u^(1/w) undefined)."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", weight_col):
        raise ValueError(f"weight_col must be a plain identifier: {weight_col!r}")
    from pyspark.sql import Window

    keyed = df.where(F.col(weight_col) > 0).withColumn(
        "__aes", F.log(_frac_expr(id_col, seed)) / F.col(weight_col)
    )
    w = Window.partitionBy(group_col).orderBy(F.col("__aes").desc(), F.col(id_col))
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("__aes")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    budget_frac: float,
    alpha: float = 0.5,
    seed: str = "tmix",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source rebalancing — the data-MIXING sampler of
    LLM training pipelines: target share of group g ∝ n_g^alpha (alpha=1
    keeps the natural mix, alpha=0 flattens to uniform; 0.5 is the usual
    compromise that upweights small high-quality sources without
    swamping the mix), scaled so the expected total is budget_frac of
    the corpus. Rows are kept by the deterministic hash-fraction draw
    (hash_frac), so the sample is reproducible across runs, engines, and
    partitionings; per-group keep rates cap at 1 (a small group whose
    target exceeds its size contributes everything it has).

    Determinism contract: the weight normalizer sums n^alpha over groups
    in GROUP-KEY ORDER (array_sort + ordered fold — IEEE addition is not
    associative, so an unordered SUM of doubles would hash-diverge); the
    per-group rate is then a fixed left-to-right expression both engines
    state identically.

    Scale shape: group stats are a |groups|-row aggregate; the stats +
    rates frame BROADCASTs back onto the corpus scan as a filter — no
    shuffle of the corpus, no global ranks (an exact-size variant would
    need a per-group rank — use reservoir_per_group if exact counts
    matter more than scan-shape).

    Output: the kept rows with (n, share, rate) attached per group.
    """
    stats = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    w = F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
    tot = (
        stats.select(F.col(group_col).alias("g"), w.alias("w"), F.col("n"))
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(g, w))),"
                " 0.0D, (acc, s) -> acc + s.w)"
            ).alias("wtot"),
            F.sum("n").alias("ntot"),
        )
    )
    rates = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n",
            (w / F.col("wtot")).alias("share"),
            F.least(
                F.lit(1.0),
                F.lit(float(budget_frac))
                * F.col("ntot")
                * (w / F.col("wtot"))
                / F.col("n"),
            ).alias("rate"),
        )
    )
    return df.join(F.broadcast(rates), group_col).where(
        _frac_expr(id_col, seed) < F.col("rate")
    )
