"""SparkSession bootstrap with scale-appropriate defaults.

Defaults chosen for correctness + 100 TB-mindset:
- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy)
- UTC session timezone (deterministic timestamp semantics vs the DuckDB oracle)
- Arrow on for any pandas interchange (vectorized UDF path)
- shuffle.partitions sized for the local harness; on a real cluster AQE's
  coalescePartitions makes the static number mostly irrelevant.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

# Runtime (non-static) confs applied to ANY session we receive, including the
# driver's. These are all settable after the JVM is up.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS); Spark has no ns
    # timestamp. Read as long + convert (see sources/registry.py) — this
    # matches DuckDB's truncate-to-micros behavior exactly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent, cheap)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark


def find_jdbc_jars() -> list[str]:
    """Best-effort discovery of JDBC driver jars in standard local
    artifact caches (coursier, maven, system java dirs). The Spark distro
    ships no database drivers, so the live-JDBC path (core/database.py
    JdbcBackend, tests/test_jdbc_live.py) only activates when a cached
    driver jar (e.g. org.duckdb:duckdb_jdbc from Maven) is discoverable.
    Override or disable with SPARK_GRAFT_JDBC_JARS (comma-separated
    paths; empty string = none). Results are static per process — call
    before the first get_spark (jars are a JVM-start config)."""
    env = os.environ.get("SPARK_GRAFT_JDBC_JARS")
    if env is not None:
        return [p for p in env.split(",") if p]
    pats = (
        "duckdb_jdbc*.jar",
        "sqlite-jdbc*.jar",
        "h2-[0-9]*.jar",
        "postgresql-[0-9]*.jar",
    )
    roots = (
        os.path.expanduser("~/.cache/coursier"),
        os.path.expanduser("~/.m2"),
        "/usr/share/java",
    )
    out: set[str] = set()
    for root in roots:
        if not os.path.isdir(root):
            continue
        for pat in pats:
            out.update(glob.glob(os.path.join(root, "**", pat), recursive=True))
    return sorted(out)


def find_delta_jars() -> list[str]:
    """Jar-discovery analog of find_jdbc_jars for delta-spark (VERDICT r5
    #4): scan the same local artifact caches for the Delta Lake runtime
    jars (delta-spark/delta-core + delta-storage). When found AND the
    `delta` Python package imports, get_spark wires the session
    extensions so sources/table_format.probe() reports delta=True and
    merge_into_path takes the real transactional MERGE branch
    (tests/test_table_format.py pins which branch ran).

    Environment status (recorded round 6): neither the jars nor the
    Python package exist anywhere in this sandbox (coursier/m2/system
    caches swept), so the delta branch is real code awaiting an
    environment that can run it — SURVEY §7.2. Override with
    SPARK_GRAFT_DELTA_JARS (comma-separated; empty string = none)."""
    env = os.environ.get("SPARK_GRAFT_DELTA_JARS")
    if env is not None:
        return [p for p in env.split(",") if p]
    pats = ("delta-spark_*.jar", "delta-core_*.jar", "delta-storage-*.jar")
    roots = (
        os.path.expanduser("~/.cache/coursier"),
        os.path.expanduser("~/.m2"),
        os.path.expanduser("~/.ivy2"),
        "/usr/share/java",
    )
    out: set[str] = set()
    for root in roots:
        if not os.path.isdir(root):
            continue
        for pat in pats:
            out.update(glob.glob(os.path.join(root, "**", pat), recursive=True))
    # The extension jar alone is useless without delta's Python bindings.
    try:
        import delta  # noqa: F401, PLC0415 - probe import
    except ImportError:
        return []
    return sorted(out)


def get_spark(app_name: str = "diepy-spark", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) a local session with engine defaults."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    jars = find_jdbc_jars()
    delta_jars = find_delta_jars()
    if jars or delta_jars:
        builder = builder.config("spark.jars", ",".join(jars + delta_jars))
    if delta_jars:
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
