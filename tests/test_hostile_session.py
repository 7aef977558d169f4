"""The driver hands __spark_entry__ an ARBITRARY SparkSession — none of
our confs, possibly a hostile timezone. session.tune() must defend at
runtime on whatever session each query receives (UTC tz, nanosAsLong for
the events ns-timestamps, Arrow). This pins the verify-skill's manual
hostile-session probe as a permanent test, using newSession() so the
probe session has its own SQLConf (session-level state — exactly what
the driver's session would differ in) while sharing the JVM.
"""

from __future__ import annotations


def _hostile(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    ns.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    return ns


def test_entry_survives_hostile_session(spark):
    import __spark_entry__ as e

    ns = _hostile(spark)
    rows = e.entry(ns).collect()
    assert len(rows) > 0
    assert {f.name for f in e.entry(ns).schema} >= {
        "l_returnflag", "l_linestatus", "cnt", "sum_qty",
    }


def test_events_query_survives_hostile_session(spark, sf_oracle):
    """r16 reads events.ts (parquet TIMESTAMP(NANOS)): without the
    nanosAsLong + UTC defense the scan or the hour-truncation differs."""
    import duckdb

    import __spark_entry__ as e

    ns = _hostile(spark)
    got = e.queries()["r16_tumbling_window"](ns, sf_oracle).collect()
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS FROM '{sf_oracle}/events.parquet'"
    )
    n_oracle = con.execute(
        f"SELECT count(*) FROM ({e.oracle_sql()['r16_tumbling_window']})"
    ).fetchone()[0]
    assert len(got) == n_oracle
    # spot-pin the first window's rendering (tz defense: UTC hour)
    first = min(got, key=lambda r: (r[0], r[1]))
    orc_first = con.execute(
        f"SELECT * FROM ({e.oracle_sql()['r16_tumbling_window']}) LIMIT 1"
    ).fetchone()
    assert str(first[0]) == str(orc_first[0])
