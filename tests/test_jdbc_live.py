"""LIVE JDBC roundtrip — the storage surface the contract tests
(test_jdbc_contract.py) pin by recording becomes a real database here:
K1 (CREATE TABLE from inferred DDL), K2 (batched INSERT), K3
(truncate-then-load), S8 (full-table scan), T9 (existence probe) against
a file-backed DuckDB over its JDBC driver (reference storage layer:
core.py:112-151,205-213).

Activates only when session.find_jdbc_jars() discovers a DuckDB driver
jar in a local artifact cache (the Spark distro ships none); skipped
with a reason otherwise. DuckDB is a single-writer engine, so writes go
through one partition (`num_partitions=1`) — the same single-connection
shape as the reference's executemany loop.
"""

import os

import pytest

from diepy_spark.core.database import JdbcBackend
from diepy_spark.functions.inference import ColumnSpec
from diepy_spark.session import find_jdbc_jars

_DUCK_JARS = [j for j in find_jdbc_jars() if "duckdb" in os.path.basename(j).lower()]

pytestmark = pytest.mark.skipif(
    not _DUCK_JARS,
    reason="no DuckDB JDBC driver jar discoverable (session.find_jdbc_jars)",
)


def _specs():
    name = ColumnSpec("name")
    for v in ("a", "bb"):
        name.observe(v)
    n = ColumnSpec("n")
    for v in ("1", "40000"):
        n.observe(v)
    d = ColumnSpec("d")
    d.observe("2024-01-02")
    return [name, n, d]


@pytest.fixture()
def backend(spark, tmp_path):
    return JdbcBackend(spark, f"jdbc:duckdb:{tmp_path}/live.db")


def test_live_create_insert_read_truncate(spark, backend):
    import datetime

    assert not backend.table_exists("people")  # T9 before create
    backend.create_table("people", _specs())   # K1 (inferred DDL types)
    assert backend.table_exists("people")      # T9 after create

    rows = [
        ("a", 1, datetime.date(2024, 1, 2)),
        ("bb", 40000, datetime.date(2024, 3, 4)),
    ]
    df = spark.createDataFrame(rows, "name string, n int, d date")
    backend.append(df, "people", num_partitions=1)  # K2 (batchsize=1000)
    got = sorted(
        (r["name"], r["n"], r["d"]) for r in backend.read_table("people").collect()
    )  # S8
    assert got == sorted(rows)

    # append again -> rows double
    backend.append(df, "people", num_partitions=1)
    assert backend.read_table("people").count() == 4

    # K3: truncate-then-load replaces contents, keeping the table
    repl = spark.createDataFrame(
        [("zz", 7, datetime.date(2025, 5, 6))], "name string, n int, d date"
    )
    backend.append(repl, "people", truncate=True, num_partitions=1)
    got = [(r["name"], r["n"], r["d"]) for r in backend.read_table("people").collect()]
    assert got == [("zz", 7, datetime.date(2025, 5, 6))]


def test_live_create_errors_on_existing(spark, backend):
    backend.create_table("dup_t", _specs())
    with pytest.raises(FileExistsError):
        backend.create_table("dup_t", _specs())
