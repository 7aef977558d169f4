"""Merge / upsert (CDC-style) — apply a batch of keyed updates to a base
table, latest version wins. The ingest-with-corrections operation every
warehouse pipeline runs; the reference's closest surface is
truncate-then-reload (core.py:205-213), which rewrites everything. This is
the incremental form.

Scale: one union (narrow) + one shuffle on the key for the per-key
latest-row window. With the base stored bucketed by key (sources/
bucketing.py) the base side's shuffle disappears; at 100 TB the practical
deployment partitions by an ingest-date column so only touched partitions
rewrite (classic merge-on-read compaction shape).

At warehouse scale the right tool is a MERGE-capable table format
(Delta Lake / Apache Iceberg `MERGE INTO`): transactional, file-level
skipping, no full-table rewrite. This operator is the FORMAT-FREE
fallback — plain parquet in, plain DataFrame out — for pipelines that
haven't adopted a table format; it recomputes the merged result rather
than committing a delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]

_SRC = "__diepy_src"
_RN = "__diepy_rn"


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str | None = None,
) -> DataFrame:
    """Return `base` with `updates` applied: rows whose key appears in
    `updates` are replaced, new keys are inserted.

    Precedence: higher `version_col` wins; on equal/absent version, the
    update wins over the base row (upsert semantics). Within `updates`,
    duplicate keys resolve by version then update-order-independent
    tie-break on the version column only — feed pre-deduplicated updates
    when versions can tie. Columns must match by name."""
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"merge_upsert: column sets differ: {sorted(cols)} vs "
            f"{sorted(updates.columns)}"
        )
    u = updates.select(*cols).withColumn(_SRC, F.lit(1))
    b = base.withColumn(_SRC, F.lit(0))
    order = [F.col(_SRC).desc()]
    if version_col:
        order.insert(0, F.col(version_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        b.unionByName(u)
        .withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN, _SRC)
    )
