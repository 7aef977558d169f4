"""Oracle-parity tests for the relational query set (SURVEY §2.7).

Mirrors the driver's correctness gate: every queries() entry with an oracle
must match DuckDB on row count, column names, and order-insensitive value
hash. Runs at sf0.001 by default for speed (the standalone
tools/check_oracle.py run covers sf0.01).
"""

import os

import duckdb
import pytest

from diepy_spark.sources.registry import TABLES
from tools.check_oracle import frame_fingerprint

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_small, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "cnt", "sum_qty"}


def test_every_query_has_callable_and_name_alignment():
    assert QUERIES, "queries() must not be empty"
    missing = [k for k in ORACLES if k not in QUERIES]
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_small):
    sdf = QUERIES[name](spark, sf_small).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    assert frame_fingerprint(sdf) == frame_fingerprint(odf)


def test_priority_rotation_names_all_resolve():
    """A misspelled name in __spark_entry__._PRIORITY silently drops out of
    the driver window (the builder loop skips unknown names) — exactly the
    failure mode a round-5 rotation edit could introduce. Make it loud."""
    missing = [n for n in entrymod._PRIORITY if n not in QUERIES]
    assert missing == [], f"_PRIORITY names not in queries(): {missing}"
    dupes = [n for n in set(entrymod._PRIORITY) if entrymod._PRIORITY.count(n) > 1]
    assert dupes == [], f"duplicate _PRIORITY entries: {dupes}"
