"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (R3, TPC-H Q1 shape) on sf0.001.
queries()      -> every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame.
oracle_sql()   -> matching DuckDB SQL per query (omitted only for
                  genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from diepy_spark.plans.relational import RELATIONAL_QUERIES, r3_hash_aggregate
from diepy_spark.plans.oracles import RELATIONAL_ORACLES
from diepy_spark.plans.extended import EXTENDED_QUERIES, EXTENDED_ORACLES
from diepy_spark.plans.pipeline import PIPELINE_QUERIES, PIPELINE_ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return r3_hash_aggregate(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(EXTENDED_QUERIES)
    out.update(PIPELINE_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(EXTENDED_ORACLES)
    out.update(PIPELINE_ORACLES)
    return out
