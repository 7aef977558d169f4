"""Test-data table registry.

The driver generates TPC-H-ish parquet at /root/testdata/sf*/ (TESTDATA.md).
Queries load via this one chokepoint so the physical source (parquet today,
JDBC/catalog tomorrow) is swappable without touching plan code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-join candidates at any scale factor.
SMALL_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan — Catalyst handles column
    pruning + predicate pruning from whatever plan is built on top.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot represent;
    with `spark.sql.legacy.parquet.nanosAsLong` the scan yields epoch-nanos
    longs, converted here via integer division (floor) to microseconds —
    bit-identical to DuckDB's ns→us truncation. The conversion is a narrow
    projection (no shuffle, stays in whole-stage codegen)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
