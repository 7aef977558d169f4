"""Structured Streaming over the events stream (SURVEY §2.6 X7).

Batch analogs of these aggregations are pinned by R16 (tumbling) and R24
(sliding) in plans/relational.py; this module is the streaming form:
`readStream` → watermark → windowed agg → `writeStream`. Late data beyond
the watermark is dropped (Spark's documented policy — the reference has no
streaming surface at all, SURVEY §2.5).

State scale: windowed aggregations keep state per (window, key) in the
state store; the watermark bounds state size. The custom stateful operator
(`sessionize_stateful`) uses applyInPandasWithState — Arrow-batched, one
state row per user — the pattern for operators Spark's built-ins can't
express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Schema of the events stream as produced by sources.registry (ts already
# converted ns→us). Streaming sources require an explicit schema.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based streaming source over a directory of events parquet."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def dedup_stream(
    events: DataFrame, key_cols: list[str] | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup (the streaming analog of X1): keep the first
    occurrence per key. Uses dropDuplicatesWithinWatermark so the dedup
    state is BOUNDED — keys older than the watermark delay are evicted,
    which is the only state policy that survives an unbounded 100 TB/day
    stream (a plain dropDuplicates grows state forever). Rows whose keys
    repeat within the watermark horizon are suppressed; the survivor's
    columns are identical for true duplicates, so output content is
    deterministic regardless of which copy wins."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols or ["event_id"])
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Streaming analog of R16: tumbling-window counts + sums per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("w"), "event_type", "c", "s")
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Sliding (hopping) window counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "event_type", "c")
    )


def enrich_counts(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    dim_key: str,
    group_col: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-STATIC enrichment join then tumbling aggregation: each
    micro-batch inner-joins the (bounded) dimension table and aggregates
    per (window, dim attribute) — the standard "enrich events with
    reference data, then roll up" streaming pipeline.

    Scale: the dimension side is broadcast (stream-static joins never
    shuffle the stream side against a broadcast dim; Spark re-plans the
    static side per micro-batch, picking up dim updates between batches).
    State is bounded by the watermark exactly as in tumbling_counts —
    the join itself is stateless."""
    joined = events.withWatermark("ts", watermark).join(
        F.broadcast(dim), events[on] == dim[dim_key]
    )
    return (
        joined.groupBy(F.window("ts", window).alias("w"), group_col)
        .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("w"), group_col, "c", "s")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Session windows: a session per user closes after `gap` of inactivity."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("s_start"), F.col("w.end").alias("s_end"), "user_id", "c")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    bound: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-STREAM inner join within an event-time bound: for every left
    event, the right events with the same key whose timestamp falls in
    (left.ts, left.ts + bound] — the funnel/attribution join (click →
    purchase within 30 minutes).

    State on BOTH sides is bounded: the time-interval join condition lets
    Spark compute a state watermark per side and evict rows that can no
    longer match (left rows older than watermark − bound, right rows older
    than the watermark) — the only stream-stream join shape that survives
    an unbounded stream. Inner joins emit each match as soon as both sides
    have arrived; with an in-order replay (disjoint ascending time-range
    files) no input is ever late, so the emitted set equals the batch
    interval join exactly — which is what the oracle checks."""
    a = left.withWatermark("ts", watermark).select(
        F.col(on).alias("a_key"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    )
    b = right.withWatermark("ts", watermark).select(
        F.col(on).alias("b_key"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (F.col("a_key") == F.col("b_key"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {bound}"))
    )
    return a.join(b, cond).select(
        F.col("a_key").alias(on), "a_id", "b_id", "a_ts", "b_ts"
    )


STATEFUL_OUTPUT_SCHEMA = "user_id bigint, events_seen bigint, total_value double"
STATEFUL_STATE_SCHEMA = "events_seen bigint, total_value double"


def sessionize_stateful(events: DataFrame, timeout_ms: str = "GroupStateTimeout.NoTimeout") -> DataFrame:
    """Custom stateful operator: running per-user event count + value sum via
    applyInPandasWithState (the escape hatch for semantics windowed aggs
    can't express). Arrow-batched; state is one row per user."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        seen = 0
        total = 0.0
        if state.exists:
            seen, total = state.get
        for pdf in pdfs:
            seen += len(pdf)
            total += float(pdf["value"].sum())
        state.update((seen, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "events_seen": [seen], "total_value": [total]}
        )

    # r13 (guide §4.1, the ewma_stateful precedent): applyInPandasWithState
    # is opaque to Catalyst, so every input column would be scanned,
    # shuffled by the groupBy, and cross the Arrow boundary. The fold
    # reads only len(pdf) and value (order-independent sums), so project
    # (user_id, value) explicitly — ts/event_id/event_type/props never
    # leave the parquet scan.
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=STATEFUL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, query_name: str, checkpoint: str, output_mode: str = "append"):
    """Execute a streaming plan over all currently-available input
    (trigger=availableNow) into an in-memory table; returns the query after
    completion. Test/bench harness utility."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


EWMA_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, ewma double"
EWMA_STATE_SCHEMA = "n bigint, acc double"


def ewma_stateful(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Streaming EWMA — the incremental sibling of
    operators/timeseries.py:ewma the batch docstring promises: per-user
    state carries (count, accumulator) across micro-batches via
    applyInPandasWithState; each batch's rows fold in (ts, event_id)
    order on top of the carried accumulator. Because the replay source
    feeds disjoint, time-ordered ranges (plans/pipeline._events_stream_dir),
    the concatenation of per-batch sorted folds IS the global-order fold,
    so the final state is bit-identical to the batch operator (same
    alpha*x + beta*acc IEEE op order). Update mode emits the running
    (n_events, ewma) per touched user each batch; the final row per user
    (max n_events) is the replay's answer."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    beta = 1.0 - alpha

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n = 0
        acc = 0.0
        if state.exists:
            n, acc = state.get
        # Materialize every Arrow chunk for the group and sort ONCE:
        # a micro-batch whose rows span multiple record batches (>~10k
        # rows, or multi-file triggers) would otherwise fold chunks in
        # arrival order rather than global (ts, event_id) order and
        # silently diverge from the batch operator / oracle.
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            for x in batch["value"].astype("float64"):
                x = float(x)
                acc = x if n == 0 else alpha * x + beta * acc
                n += 1
        state.update((n, acc))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma": [acc]}
        )

    # r13 (guide §4.1): applyInPandasWithState is opaque to Catalyst —
    # every input column is scanned, shuffled by the groupBy, and crosses
    # the Arrow boundary. The fold reads only (ts, event_id, value), so
    # project them (plus the key) explicitly: the props JSON string and
    # event_type never leave the parquet scan. The fold itself is
    # chunking-immune (all chunks are concatenated and sorted before the
    # per-row recurrence), so the narrower rows cannot change the result.
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_OUTPUT_SCHEMA = (
    "event_type string, n_events bigint, s_cal bigint, g bigint,"
    " max_g bigint, n_alarms bigint"
)
CUSUM_STATE_SCHEMA = (
    "n bigint, s_cal bigint, g bigint, mx bigint, alarms bigint"
)


def cusum_stateful(
    events: DataFrame, w: int, k_cents: int, h: int
) -> DataFrame:
    """Streaming one-sided CUSUM drift detector (Page 1954) per event
    type — the ONLINE sibling of the batch x8_cusum_changepoint
    locator: the first `w` events calibrate the reference level
    (s_cal = their cents sum), after which each event folds
    g = max(0, g + (cents*w - s_cal - k_cents*w)) with an alarm (and
    reset) when g crosses `h`.  Everything is BIGINT arithmetic on
    pre-computed integer cents, so the carried state is exactly
    reproducible by a batch fold — same disjoint-time-ordered-batches
    argument as ewma_stateful, with no IEEE concern at all.

    State per key is five integers; alarms/max record the drift
    narrative without keeping any event history — bounded state at any
    stream length."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n = s_cal = g = mx = alarms = 0
        if state.exists:
            n, s_cal, g, mx, alarms = state.get
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            for c in batch["cents"]:
                c = int(c)
                n += 1
                if n <= w:
                    s_cal += c
                else:
                    g2 = g + (c * w - s_cal - k_cents * w)
                    if g2 < 0:
                        g2 = 0
                    if g2 > mx:
                        mx = g2
                    if g2 > h:
                        alarms += 1
                        g = 0
                    else:
                        g = g2
        state.update((n, s_cal, g, mx, alarms))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "s_cal": [s_cal],
                "g": [g],
                "max_g": [mx],
                "n_alarms": [alarms],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
