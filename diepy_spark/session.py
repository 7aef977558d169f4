"""SparkSession bootstrap with scale-appropriate defaults.

Defaults chosen for correctness + 100 TB-mindset:
- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy)
- UTC session timezone (deterministic timestamp semantics vs the DuckDB oracle)
- Arrow on for any pandas interchange (vectorized UDF path)
- shuffle.partitions sized for the local harness; on a real cluster AQE's
  coalescePartitions makes the static number mostly irrelevant.
"""

from __future__ import annotations

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
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
