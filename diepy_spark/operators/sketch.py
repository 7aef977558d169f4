"""Distinct-count sketching: K-Minimum-Values (KMV) estimator.

The reference has no aggregation surface at all (SURVEY.md §2.5); sketches
are part of the north-star extension set (cardinality estimation over
100 TB document corpora where an exact COUNT(DISTINCT) is a full shuffle of
every distinct value).

Why KMV instead of HyperLogLog here: KMV over a *deterministic* hash (md5)
yields bit-identical estimates in any engine that can hash and sort — which
makes it oracle-checkable against DuckDB, unlike HLL whose register layouts
differ per implementation. The estimator is the classic
``(k-1) / h_(k)`` of Bar-Yossef et al. (2002), with ``h_(k)`` the k-th
smallest hash mapped into [0, 1).

Portability contract: the hex→fraction map uses only ``instr``/``substr``/
``power`` with exactly-representable binary terms (digit * 16^-i =
digit * 2^-4i, 8 nibbles = 32 bits < 53-bit mantissa), so Spark and DuckDB
compute the SAME double, term for term. `_hex_frac_sql` is shared verbatim
by the Spark plan (via `F.expr`) and the DuckDB oracle.

Scale design: the only shuffle is the per-group distinct of hashes, which
has map-side partial aggregation; the window top-k that follows touches
distinct hashes only. At extreme cardinality you would swap the distinct
for a bounded-memory per-partition top-k aggregator (same estimator, same
answer); the operator's API would not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_distinct", "hex_frac_sql"]

_HEX = "0123456789abcdef"


def hex_frac_sql(col: str, nibbles: int = 8) -> str:
    """SQL expression mapping the first `nibbles` hex chars of `col` to a
    double in [0, 1). Valid and bit-identical in both Spark SQL and DuckDB."""
    terms = [
        f"(instr('{_HEX}', substr({col},{i},1))-1)*power(16.0,-{i})"
        for i in range(1, nibbles + 1)
    ]
    return " + ".join(terms)


def kmv_distinct(
    df: DataFrame,
    on: list[str],
    value_col: str,
    k: int = 64,
    include_exact: bool = False,
) -> DataFrame:
    """Per-group distinct-count estimate via K-Minimum-Values over
    ``md5(value_col)``. Groups with fewer than k distinct values report the
    exact count (the sketch is lossless below its capacity).

    Output: ``on`` + ``kmv_estimate`` (double, rounded to 4 decimals), plus
    ``n_distinct_true`` when ``include_exact`` (cheap here — the distinct
    set is already materialized to rank it).
    """
    hv = df.select(*on, F.md5(F.col(value_col).cast("string")).alias("h")).distinct()
    w = Window.partitionBy(*on).orderBy("h")
    ranked = hv.select(
        *on,
        F.expr(hex_frac_sql("h")).alias("f"),
        F.row_number().over(w).alias("rn"),
    )
    est = F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
        F.lit(float(k - 1)) / F.max(F.when(F.col("rn") == k, F.col("f")))
    )
    aggs = [F.round(est, 4).alias("kmv_estimate")]
    if include_exact:
        aggs.insert(0, F.count(F.lit(1)).alias("n_distinct_true"))
    return ranked.groupBy(*on).agg(*aggs)
