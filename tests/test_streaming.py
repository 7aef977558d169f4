"""Structured Streaming tests: stream the sf0.001 events through the
windowed/stateful operators with trigger=availableNow and compare against
the equivalent batch aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from diepy_spark.sources.registry import load_table
from diepy_spark.streaming import events as ST

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-materialized as a parquet directory with us-timestamps
    (streaming sources need a directory + a non-ns schema)."""
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, SF, "events").repartition(4).write.parquet(d)
    return d


def test_tumbling_counts_match_batch(spark, events_dir, tmp_path):
    stream = ST.tumbling_counts(ST.read_events_stream(spark, events_dir))
    ST.run_to_memory(stream, "tumbling_t", str(tmp_path / "ck1"), output_mode="append")
    got = {
        (r["w"], r["event_type"]): (r["c"], round(r["s"], 6))
        for r in spark.table("tumbling_t").collect()
    }
    ev = load_table(spark, SF, "events")
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    )
    # append mode emits a window only once the watermark (max ts - 10 min)
    # passes its END — windows still open at end-of-input are withheld.
    import datetime

    max_ts = ev.agg(F.max("ts")).first()[0]
    wm = max_ts - datetime.timedelta(minutes=10)
    expected = {
        (r["w"], r["event_type"]): (r["c"], r["s"])
        for r in batch
        if r["w"] + datetime.timedelta(hours=1) <= wm
    }
    assert got == expected and len(got) > 0


def test_sliding_counts_run(spark, events_dir, tmp_path):
    stream = ST.sliding_counts(ST.read_events_stream(spark, events_dir))
    ST.run_to_memory(stream, "sliding_t", str(tmp_path / "ck2"))
    rows = spark.table("sliding_t").collect()
    assert len(rows) > 0
    # hopping windows: each event lands in 4 windows (1h window, 15m slide);
    # windows still open at end-of-input are withheld by append mode, so the
    # emitted total is slightly under 4n but must stay within one hour's
    # worth of tail events.
    total = sum(r["c"] for r in rows)
    n_events = load_table(spark, SF, "events").count()
    assert 4 * n_events * 0.95 <= total <= 4 * n_events


def test_session_window_run(spark, events_dir, tmp_path):
    stream = ST.session_counts(ST.read_events_stream(spark, events_dir), gap="30 minutes")
    ST.run_to_memory(stream, "session_t", str(tmp_path / "ck3"))
    rows = spark.table("session_t").collect()
    assert len(rows) > 0
    assert all(r["s_end"] > r["s_start"] for r in rows)
    # per-user session counts can't exceed the user's event total (sessions
    # still open at end-of-input are withheld), and most events must land.
    per_user = {}
    for r in rows:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + r["c"]
    batch = dict(
        load_table(spark, SF, "events").groupBy("user_id").count().rdd.map(tuple).collect()
    )
    assert all(per_user[u] <= batch[u] for u in per_user)
    assert sum(per_user.values()) >= 0.8 * sum(batch.values())


def test_stateful_sessionize(spark, events_dir, tmp_path):
    stream = ST.sessionize_stateful(ST.read_events_stream(spark, events_dir))
    ST.run_to_memory(stream, "stateful_t", str(tmp_path / "ck4"), output_mode="update")
    rows = spark.table("stateful_t").collect()
    assert len(rows) > 0
    # last update per user must equal the batch totals
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["events_seen"], round(r["total_value"], 6))
    batch = load_table(spark, SF, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v")
    )
    expected = {r["user_id"]: (r["n"], r["v"]) for r in batch.collect()}
    assert last == expected


def test_late_event_dropped_in_append_mode(spark, tmp_path):
    """Watermark semantics, not batch aggregation: a multi-batch replay
    where a later batch carries an event OLDER than the established
    watermark. Append mode must drop it — the emitted window count
    excludes the late row. (A single-batch replay cannot distinguish this
    from plain batch aggregation.)

    Measured Spark propagation detail: the watermark computed from batch
    N's data takes effect for late-row filtering one batch later (a late
    row in batch N+1 still lands; in batch N+2 it is dropped) — hence the
    interposed batch here."""
    import datetime as dt

    d = str(tmp_path / "late_events")
    os.makedirs(d, exist_ok=True)
    ck = str(tmp_path / "ck_late")

    def ev(i, h, m, typ="a"):
        return (i, dt.datetime(2026, 1, 1, h, m, 0), 1, typ, 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batches = [
        # window [10:00) gets 2 events; max ts 11:30 -> watermark 11:20
        [ev(1, 10, 0), ev(2, 10, 30), ev(3, 11, 30)],
        # interposed batch (watermark propagation lag) -> wm 11:35
        [ev(4, 11, 45)],
        # LATE event at 10:05 (window end 11:00 < wm -> dropped) + a fresh
        # 13:00 event that advances the watermark to flush windows 10/11
        [ev(5, 10, 5), ev(6, 13, 0)],
    ]
    for i, rows in enumerate(batches):
        f = os.path.join(d, f"batch{i}.parquet")
        # coerce: pandas would otherwise write TIMESTAMP(NANOS)
        spark.createDataFrame(rows, cols).toPandas().to_parquet(f, coerce_timestamps="us")
        os.utime(f, (1_600_000_000 + i * 60,) * 2)

    stream = ST.tumbling_counts(
        ST.read_events_stream(spark, d, max_files_per_trigger=1),
        "1 hour",
        "10 minutes",
    )
    ST.run_to_memory(stream, "late_t", ck, output_mode="append")
    got = {(r["w"].hour, r["event_type"]): r["c"] for r in spark.table("late_t").collect()}
    # late 10:05 NOT counted in window 10; 11:45 counted in window 11;
    # the 13:00 window is withheld (still open at end of input)
    assert got == {(10, "a"): 2, (11, "a"): 2}


def test_late_drop_comparator(spark, tmp_path):
    """Pins the two constants the x7_stream_late oracle encodes
    (plans/pipeline.py): the watermark visible to batch j's late filter
    reflects data through batch j-2 (_LATE_WM_LAG=2), and the boundary
    comparator is window_end <= watermark -> dropped (_LATE_DROP_CMP).
    The fixture puts one late row exactly AT the watermark boundary and
    one a full batch earlier, so each (lag, comparator) hypothesis
    yields a distinct result set:
      - window 09 present at all       -> lag is 2, not 1
      - window 10 count 2 (not 3)      -> comparator is <=, not <
    If a Spark upgrade changes either, this fails loudly and the oracle
    constants must be re-measured."""
    import datetime as dt

    from diepy_spark.plans.pipeline import _LATE_DROP_CMP, _LATE_WM_LAG

    d = str(tmp_path / "late_cmp")
    os.makedirs(d, exist_ok=True)
    ck = str(tmp_path / "ck_late_cmp")

    def ev(i, h, m, typ="a"):
        return (i, dt.datetime(2026, 1, 1, h, m, 0), 1, typ, 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batches = [
        [ev(1, 10, 15)],
        [ev(2, 13, 0)],
        # wm here (lag2) = 10:15 - 2h = 08:15 -> both late rows land;
        # under lag1 it would be 11:00 and both would drop
        [ev(3, 16, 0), ev(4, 10, 30), ev(5, 9, 30)],
        # wm here (lag2) = 13:00 - 2h = 11:00 == window-10's end:
        # dropped iff the comparator is <=
        [ev(6, 20, 0), ev(7, 10, 40)],
    ]
    for i, rows in enumerate(batches):
        f = os.path.join(d, f"batch{i}.parquet")
        spark.createDataFrame(rows, cols).toPandas().to_parquet(
            f, coerce_timestamps="us"
        )
        os.utime(f, (1_600_000_000 + i * 60,) * 2)

    stream = ST.tumbling_counts(
        ST.read_events_stream(spark, d, max_files_per_trigger=1),
        "1 hour",
        "2 hours",
    )
    ST.run_to_memory(stream, "late_cmp", ck, output_mode="append")
    got = {
        (r["w"].hour, r["event_type"]): r["c"]
        for r in spark.table("late_cmp").collect()
    }
    assert got == {(9, "a"): 1, (10, "a"): 2, (13, "a"): 1, (16, "a"): 1}
    # the oracle constants must encode exactly the semantics proven above
    assert _LATE_WM_LAG == 2
    assert _LATE_DROP_CMP == "<="


def test_dedup_stream_drops_doubled_input(spark, events_dir, tmp_path):
    doubled = ST.read_events_stream(spark, events_dir).unionByName(
        ST.read_events_stream(spark, events_dir)
    )
    stream = ST.dedup_stream(doubled)
    ST.run_to_memory(stream, "dedup_t", str(tmp_path / "ck5"))
    got = spark.table("dedup_t")
    n_orig = load_table(spark, SF, "events").count()
    assert got.count() == n_orig  # every duplicate suppressed, none lost
    assert got.select("event_id").distinct().count() == n_orig


@pytest.mark.parametrize(
    "qname",
    [
        # the batching-invariance least-obvious profiles: windowed append,
        # update-mode custom state, doubled-source dedup, stream-stream
        # join state
        "x7_stream_tumbling",
        "x7_stream_stateful",
        "x7_stream_dedup",
        "x7_stream_join",
        "x7_stream_hll",
    ],
)
def test_mfpt_bench_profile_same_result(spark, monkeypatch, qname):
    """The bench profile's 2-files-per-trigger replay (SPARK_GRAFT_STREAM_MFPT=2)
    must emit the EXACT same final result set as the default full 4-batch
    replay — the knob trades micro-batch count for time, never output."""
    from diepy_spark.plans import pipeline as P

    fn = P.PIPELINE_QUERIES[qname]

    def fp(df):
        return sorted(tuple(r) for r in df.collect())

    monkeypatch.delenv("SPARK_GRAFT_STREAM_MFPT", raising=False)
    full = fp(fn(spark, SF))
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MFPT", "2")
    fast = fp(fn(spark, SF))
    assert full == fast and len(full) > 0


def test_interval_join_matches_across_batches(spark, tmp_path):
    """Stream-stream join state must carry a left row across micro-batch
    boundaries: the click in batch 0 matches the purchase in batch 1.
    Pairs outside the 30-minute bound or with a different user must not
    match."""
    import datetime as dt

    d = str(tmp_path / "join_events")
    os.makedirs(d, exist_ok=True)

    def ev(i, h, m, typ, uid=1):
        return (i, dt.datetime(2026, 1, 1, h, m, 0), uid, typ, 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batches = [
        # clicks early; one purchase in-batch within bound (10:00 -> 10:20)
        [ev(1, 10, 0, "click"), ev(2, 10, 20, "purchase"),
         ev(3, 10, 50, "click"), ev(4, 10, 0, "click", uid=2)],
        # purchase 11:10 matches click 10:50 (20 min, CROSS-batch);
        # purchase 11:40 matches nothing (50 min after click 10:50);
        # uid-2 purchase within bound but different user than click 3
        [ev(5, 11, 10, "purchase"), ev(6, 11, 40, "purchase"),
         ev(7, 10, 25, "purchase", uid=2)],
    ]
    for i, rows in enumerate(batches):
        f = os.path.join(d, f"b{i}.parquet")
        spark.createDataFrame(rows, cols).toPandas().to_parquet(f, coerce_timestamps="us")
        os.utime(f, (1_600_000_000 + i * 60,) * 2)

    clicks = ST.read_events_stream(spark, d, max_files_per_trigger=1).where(
        F.col("event_type") == "click"
    )
    buys = ST.read_events_stream(spark, d, max_files_per_trigger=1).where(
        F.col("event_type") == "purchase"
    )
    stream = ST.interval_join(clicks, buys, on="user_id", bound="30 minutes")
    ST.run_to_memory(stream, "ivj_t", str(tmp_path / "ck_ivj"))
    got = {(r["a_id"], r["b_id"]) for r in spark.table("ivj_t").collect()}
    assert got == {(1, 2), (3, 5), (4, 7)}
