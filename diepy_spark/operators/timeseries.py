"""Time-series operators Spark lacks as built-ins: as-of join and gap
sessionization.

Neither exists in the reference (`/root/reference/diepy/core.py` has no query
operators at all — SURVEY.md §2.5); both are mandated by the north-star
extension surface (training-data pipelines over event streams).

Scale design: both operators are ONE shuffle on the partition key followed by
a within-partition sort (window). There is no range-condition join and no
cross product, so cost is O(n log n_per_key) and skew is bounded by the
hottest key, not by time-range overlap. This is the plan you want at 100 TB:
an as-of join expressed as a range join would explode; expressed as
union+last_value it is a single sort-merge pass.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "assign_sessions", "ewma", "resample_gapfill"]


def _q(ident: str) -> str:
    """Backtick-quote a column name for embedding in an expr string."""
    return f"`{ident}`"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    payload: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: attach to each left row the payload columns of the
    LATEST right row with equal key columns and ``right.ts_col <= left.ts_col``
    (inclusive — a right row at exactly the left timestamp matches, the same
    contract as DuckDB ``ASOF JOIN`` / pandas ``merge_asof``).

    Left rows with no prior right row keep NULL payloads (left-outer
    semantics); filter on a payload column for inner semantics.

    Implementation: union both sides tagged with a side marker, one window
    ``last(payload_struct, ignorenulls=True)`` over
    ``partitionBy(on).orderBy(ts_col, side)`` — right rows sort before left
    rows at equal timestamps so inclusivity falls out of the sort order. The
    payload rides in a single struct so legitimately-NULL payload *fields*
    are carried faithfully (a per-column ``last(ignorenulls)`` would skip
    them).

    Determinism note: if the right side can hold several rows at the same
    (key, ts), pre-dedupe it or the "latest" pick among ties is plan-order
    dependent (same as every engine's ASOF).
    """
    keyset = set(on) | {ts_col}
    if payload is None:
        payload = [c for c in right.columns if c not in keyset]
    left_cols = left.columns
    overlap = set(payload) & set(left_cols)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")

    pay_struct = F.struct(*[F.col(c) for c in payload]).alias("__asof")
    rpart = right.select(
        *[F.col(c) for c in on], F.col(ts_col), F.lit(0).alias("__side"), pay_struct
    )
    # Left-only columns ride as NULLs on right rows so the union lines up.
    for c in left_cols:
        if c not in keyset:
            rpart = rpart.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    struct_type = rpart.schema["__asof"].dataType
    lpart = left.select(
        *left_cols, F.lit(1).alias("__side"), F.lit(None).cast(struct_type).alias("__asof")
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lpart.unionByName(rpart.select(lpart.columns)).select(
        *left_cols, "__side", F.last("__asof", ignorenulls=True).over(w).alias("__asof")
    )
    return filled.where(F.col("__side") == 1).select(
        *left_cols, *[F.col(f"__asof.{c}").alias(c) for c in payload]
    )


def assign_sessions(
    df: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: add a ``session_seq`` column (1-based, per
    key) that increments whenever the gap to the previous event of the same
    key exceeds ``gap_seconds``. A gap of exactly ``gap_seconds`` stays in
    the same session (strict ``>`` starts a new one).

    Microsecond-exact: gaps are compared in ``unix_micros`` so sub-second
    timestamps never alias (``unix_timestamp`` would truncate to seconds).

    This is the batch analog of the streaming session window
    (`diepy_spark.streaming.events`); unlike ``F.session_window`` it exposes
    the session *index*, which downstream operators can join or window on.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*on).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    # unix_micros requires TIMESTAMP (rejects TIMESTAMP_NTZ, which parquet
    # scans yield under NTZ inference). Cast explicitly: the session tz
    # offset is constant and cancels in the gap difference.
    ts_ltz = F.col(ts_col).cast("timestamp")
    gap_us = F.unix_micros(ts_ltz) - F.unix_micros(prev.cast("timestamp"))
    flagged = df.withColumn(
        "__new_session",
        F.when(prev.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0),
    )
    wcum = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.withColumn("session_seq", F.sum("__new_session").over(wcum)).drop(
        "__new_session"
    )


@lru_cache(maxsize=8)
def _ewm_matches_fold(alpha: float) -> bool:
    """Guard for the vectorized EWMA fast path (ADVICE r5): the
    bit-identity argument rests on pandas ``ewm(adjust=False)``
    evaluating ``(beta*acc + alpha*x) / (beta + alpha)`` — an
    implementation detail a pandas upgrade could change. Probe once per
    process per alpha: run one awkward-valued segment through pandas and
    through the scalar fold; any bit mismatch disables the fast path so
    hash-identity with the DuckDB oracle degrades to the (slower,
    always-correct) loop instead of breaking silently.
    """
    import pandas as pd

    beta = 1.0 - alpha
    seg = [1.0 / 3.0, 7.7, -0.1, 1e17, 3e-9, 2.5000000000000004, -1e17, 0.1]
    got = pd.Series(seg).ewm(alpha=alpha, adjust=False).mean().to_numpy()
    acc = None
    for i, x in enumerate(seg):
        acc = x if acc is None else alpha * x + beta * acc
        if got[i] != acc:
            return False
    return True


def ewma(
    df: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    tiebreak: list[str] | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponential smoothing (EWMA): ``s_1 = x_1``,
    ``s_t = alpha*x_t + (1-alpha)*s_{t-1}`` over each key's events ordered
    by ``(ts_col, *tiebreak)``. Returns the input rows (projected to key +
    order + value columns) plus ``out_col`` — the running smoothed value
    at every event.

    A recurrence is the one shape Spark's declarative surface cannot
    express (no window SCAN primitive, and the closed-form weight
    ``(1-a)^(t-i)`` overflows the double mantissa for long series), so
    this is the documented Pandas-UDF escape hatch — as a SORTED-
    PARTITION SCAN, not per-group calls: ONE shuffle (repartition on the
    key) + sortWithinPartitions, then ``mapInPandas`` runs the
    recurrence over each Arrow batch, carrying the accumulator of the
    group that spans a batch boundary. One Python call per ~10k-row
    batch instead of one per key (measured 4.2s -> sub-second at sf0.1
    with 1.5k keys — per-group applyInPandas overhead dominated). Keys
    never span partitions (hash repartition), so the carry is exact; for
    unbounded streams a stateful sibling
    (`streaming.events.sessionize_stateful`'s applyInPandasWithState
    pattern) carries the recurrence incrementally.

    Cross-engine exactness: the update is evaluated exactly as
    ``alpha*x + beta*acc`` (beta precomputed as ``1.0 - alpha``) in
    float64 — two products then one sum, the same IEEE-754 operation
    order a DuckDB ``list_reduce(list(x ORDER BY ...), (a, x) ->
    alpha*x + beta*a)`` fold performs, so results are bit-identical.

    Throughput: the recurrence runs per SEGMENT (one contiguous key run
    in the sorted batch) through pandas ``ewm(alpha, adjust=False)`` —
    Cython, and bit-identical to the Python fold because with
    ``adjust=False`` pandas evaluates ``(beta*acc + alpha*x) /
    (beta + alpha)``: the addition is commutative under IEEE-754
    round-to-nearest and the divisor is exactly 1.0 whenever
    ``alpha + beta == 1.0`` (asserted; the per-row loop remains as the
    fallback for alphas where that fails and for NaN-bearing segments,
    where pandas' skip-NaN weighting diverges from NaN-poisoning). A
    cross-batch carry seeds a continuing segment by prepending the
    accumulator and dropping the first output row. Measured at sf0.1:
    the per-row interpreter fold is the ceiling this replaces —
    see SURVEY §6 (r52 A/B).
    """
    order = [ts_col] + list(tiebreak or [])
    cols: list[str] = []
    for c in list(on) + order + [value_col]:
        if c not in cols:
            cols.append(c)
    sub = df.select(*cols)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in sub.schema.fields]
        + [f"{out_col} double"]
    )
    beta = 1.0 - alpha
    keys = list(on)

    vectorizable = (alpha + beta) == 1.0 and _ewm_matches_fold(alpha)

    def scan(batches):
        import numpy as np
        import pandas as pd

        cur_key = None
        acc = None
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                pdf = pdf.copy()
                pdf[out_col] = []
                yield pdf
                continue
            vals = pdf[value_col].astype("float64").to_numpy()
            kcols = [pdf[c].to_numpy() for c in keys]
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for kc in kcols:
                change[1:] |= kc[1:] != kc[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            out = np.empty(n, dtype=np.float64)
            for s, e in zip(starts, ends):
                k = tuple(kc[s] for kc in kcols)
                seg = vals[s:e]
                continuing = k == cur_key and acc is not None
                # NaN anywhere (segment values OR a carried NaN
                # accumulator) takes the loop path: pandas ewm SKIPS
                # NaNs, while the recurrence contract poisons everything
                # downstream of one.
                carried_nan = continuing and acc != acc
                if vectorizable and not carried_nan and not np.isnan(seg).any():
                    if continuing:
                        seeded = np.concatenate(([acc], seg))
                        out[s:e] = (
                            pd.Series(seeded)
                            .ewm(alpha=alpha, adjust=False)
                            .mean()
                            .to_numpy()[1:]
                        )
                    else:
                        out[s:e] = (
                            pd.Series(seg)
                            .ewm(alpha=alpha, adjust=False)
                            .mean()
                            .to_numpy()
                        )
                else:
                    a = acc if continuing else None
                    for i in range(s, e):
                        x = float(vals[i])
                        a = x if a is None else alpha * x + beta * a
                        out[i] = a
                cur_key = k
                acc = float(out[e - 1])
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    parts = sub.repartition(
        df.sparkSession.sparkContext.defaultParallelism, *[F.col(c) for c in keys]
    ).sortWithinPartitions(*keys, *order)
    return parts.mapInPandas(scan, schema=out_schema)


def resample_gapfill(
    df: DataFrame,
    every_seconds: int,
    on: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style resample + gap-fill: bucket rows into fixed
    `every_seconds` windows per key, aggregate the value (exact decimal
    sum cast to double), then densify each key's timeline — every bucket
    between the key's first and last appears, with missing buckets filled
    by last-observation-carried-forward (LOCF) and flagged `was_gap`.

    The downsampling step every time-series store exposes (TimescaleDB
    time_bucket_gapfill / InfluxDB GROUP BY time fill(previous)), needed
    before charting or windowed feature extraction over sparse streams.

    Scale: the bucket aggregate is ONE shuffle with map-side combine; the
    spine is generated per key from its (min, max) bucket — a sequence
    explode whose row count equals the dense timeline, never a cross
    join against a global calendar — and the LOCF fill is one window over
    the same key partitioning, so the exchange is reused."""
    # pure integer floor-division on microseconds: identical truncation in
    # Spark (`div`) and DuckDB (`//`) — never a double in the bucket math
    us = every_seconds * 1_000_000
    bucket = (
        F.expr(f"unix_micros(cast({_q(ts_col)} as timestamp)) div {us}") * every_seconds
    ).alias("bucket_s")
    agg = (
        df.select(F.col(on).alias("k"), bucket, F.col(value_col))
        .groupBy("k", "bucket_s")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    spine = (
        agg.groupBy("k")
        .agg(F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi"))
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.lit(int(every_seconds)))
            ).alias("bucket_s"),
        )
    )
    dense = spine.join(agg, ["k", "bucket_s"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        F.col("k").alias(on),
        F.timestamp_seconds("bucket_s").alias("bucket"),
        F.last("s", ignorenulls=True).over(w).alias("s_filled"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.col("s").isNull().alias("was_gap"),
    )
