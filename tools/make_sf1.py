"""Synthesize an sf1 dataset (10x sf0.1) for the scale ladder.

/root/testdata tops out at sf0.1 (~17 MB), so every 100x-scale claim in
the repo is a design argument plus plan-shape pins. This tool converts
them into measurements: replicate sf0.1 ten times with RE-KEYED ids
(primary keys shift by replica * stride; foreign keys shift by the SAME
stride so referential joins stay exact at 10x fan-in), written once to
parquet under spark-warehouse/sf1/. nation/region are genuine small
dims and are copied unreplicated (at any real scale they stay
broadcast-sized). Text/embedding payloads are copied verbatim per
replica — exact cross-replica duplicates are exactly what a dedup
pipeline meets at scale.

Usage: python tools/make_sf1.py [out_dir]   (default spark-warehouse/sf1)
Then:  python tools/bench_scale.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from diepy_spark.session import get_spark
from diepy_spark.sources.registry import load_table

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# key column -> owning stride group; every column in a group shifts by
# the same stride so foreign keys keep referencing the replica's copy.
KEY_GROUPS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
SMALL_DIMS = ("region", "nation")


def _stride(maxval: int) -> int:
    s = 10
    while s <= maxval:
        s *= 10
    return s


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", "sf1",
    )
    spark = get_spark("diepy-make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    # One stride per key GROUP (max over every column in the group, so
    # e.g. o_custkey and c_custkey shift identically).
    group_max: dict[str, int] = {}
    for table, cols in KEY_GROUPS.items():
        df = load_table(spark, SRC, table)
        aggs = [F.max(c).alias(c) for c in cols]
        row = df.agg(*aggs).collect()[0]
        for c, g in cols.items():
            group_max[g] = max(group_max.get(g, 0), int(row[c]))
    strides = {g: _stride(m) for g, m in group_max.items()}
    print("strides:", strides)

    for table in SMALL_DIMS:
        df = load_table(spark, SRC, table)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
        print(f"{table}: copied (small dim)")

    reps = spark.range(REPLICAS).selectExpr("CAST(id AS BIGINT) AS _rep")
    for table, cols in KEY_GROUPS.items():
        df = load_table(spark, SRC, table)
        wide = df.crossJoin(F.broadcast(reps))
        exprs = []
        for c in df.columns:
            if c in cols:
                s = strides[cols[c]]
                exprs.append(f"CAST({c} + _rep * {s} AS BIGINT) AS {c}")
            else:
                exprs.append(c)
        wide = wide.selectExpr(*exprs)
        wide.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
        n = spark.read.parquet(os.path.join(out, f"{table}.parquet")).count()
        print(f"{table}: {n} rows")
    print("done ->", out)


if __name__ == "__main__":
    main()
