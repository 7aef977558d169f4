"""Bucketed catalog tables: shuffle-free co-located joins.

`df.write.bucketBy(n, cols).sortBy(cols).saveAsTable(...)` hash-partitions
rows into a fixed number of buckets AT WRITE TIME and records the layout in
the catalog. A later equi-join of two tables bucketed the same way on the
join key needs NO exchange on either side — the classic pre-shuffle
amortization for fact tables joined repeatedly on the same key (at 100 TB,
one write-time shuffle replaces one per query). Spark only exploits this
through the catalog (path-based parquet loses the bucket metadata), hence
saveAsTable rather than the parquet-directory warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write df as a catalog table bucketed (and optionally sorted) on
    bucket_cols. Sorting within buckets additionally removes the sort from
    later sort-merge joins."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
