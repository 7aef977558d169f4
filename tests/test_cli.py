"""CLI surface (P4-P7): `python -m diepy_spark.cli import|export` end-to-end
against a parquet warehouse backed by a diepy.ini config."""

import csv
import os

import pytest

from diepy_spark import cli
from tests.test_inference import BASIC_CSV


@pytest.fixture()
def env(spark, tmp_path):
    ini = tmp_path / "diepy.ini"
    wh = tmp_path / "warehouse"
    ini.write_text(f"[servers]\ntest = {wh}\n")
    src = tmp_path / "basic.csv"
    src.write_text(BASIC_CSV)
    return {"ini": str(ini), "src": str(src), "tmp": tmp_path}


def test_cli_import_then_export(env, tmp_path):
    rc = cli.main(["import", "--config", env["ini"], env["src"], "test.db"])
    assert rc == 0
    out = str(tmp_path / "out.csv")
    rc = cli.main(["export", "--config", env["ini"], "--unix", "test.db..basic", out])
    assert rc == 0
    with open(out, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert {r["int"] for r in rows} == {"1", "2", "3"}


def test_cli_import_truncate_idempotent(env):
    for _ in range(2):
        rc = cli.main(
            ["import", "--truncate", "--config", env["ini"], env["src"], "test.db"]
        )
        assert rc == 0
    from diepy_spark.context import DiepyContext
    from diepy_spark.session import get_spark

    ctx = DiepyContext(get_spark(), "test", "db", env["ini"])
    assert ctx.backend.read_table("basic").count() == 3


def test_cli_export_rejects_short_path(env, capsys):
    rc = cli.main(["export", "--config", env["ini"], "test.db", "out.csv"])
    assert rc == 2
    assert "4-part" in capsys.readouterr().err


def test_cli_export_datestamp_decorates(env, tmp_path):
    cli.main(["import", "--config", env["ini"], env["src"], "test.db"])
    out = str(tmp_path / "stamped.csv")
    rc = cli.main(
        ["export", "--config", env["ini"], "--datestamp", "test.db..basic", out]
    )
    assert rc == 0
    produced = [p for p in os.listdir(tmp_path) if p.startswith("stamped-")]
    assert len(produced) == 1 and produced[0].endswith(".csv")


@pytest.fixture()
def docs_parquet(spark, tmp_path):
    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, good),
        (2, good),                                  # exact dup
        (3, good + " tonight"),                     # near dup
        (4, "spam spam spam spam spam spam spam"),  # low quality
        (5, "completely different quality words appear here in this other document thing"),
    ]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    return p


def test_cli_dedup_exact(docs_parquet, tmp_path, spark, capsys):
    out = str(tmp_path / "out1")
    rc = cli.main(["dedup", docs_parquet, out, "--method", "exact"])
    assert rc == 0
    import json

    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (stats["docs_in"], stats["docs_out"], stats["removed"]) == (5, 4, 1)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3, 4, 5}  # doc 2 collapsed into 1


def test_cli_dedup_minhash(docs_parquet, tmp_path, spark, capsys):
    out = str(tmp_path / "out2")
    rc = cli.main(["dedup", docs_parquet, out, "--method", "minhash", "--threshold", "0.5"])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # 1, 2, 3 form one near-dup cluster -> min id 1 survives
    assert kept == {1, 4, 5}


def test_cli_clean(docs_parquet, tmp_path, spark, capsys):
    out = str(tmp_path / "out3")
    rc = cli.main([
        "clean", docs_parquet, out,
        "--min-tokens", "5", "--min-score", "0.3", "--max-dup3", "0.3",
        "--jaccard", "0.5",
    ])
    assert rc == 0
    import json

    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == 5
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 5}  # gate drops 4; dedup collapses 2 and 3 into 1


def test_cli_profile(docs_parquet, tmp_path, spark, capsys):
    rc = cli.main(["profile", docs_parquet, "--columns", "doc_id,text"])
    assert rc == 0
    import json

    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    by_col = {d["column"]: d for d in lines}
    assert set(by_col) == {"doc_id", "text"}
    assert by_col["doc_id"]["n_null"] == 0
    assert by_col["doc_id"]["n_distinct"] == by_col["doc_id"]["n_rows"]


def test_cli_diff(docs_parquet, tmp_path, spark, capsys):
    import json

    old = docs_parquet
    newdir = str(tmp_path / "docs_new")
    df = spark.read.parquet(old)
    from pyspark.sql import functions as F

    df.where(F.col("doc_id") != 1).withColumn(
        "text", F.when(F.col("doc_id") == 4, F.lit("mutated")).otherwise(F.col("text"))
    ).write.parquet(newdir)
    out = str(tmp_path / "changeset")
    rc = cli.main(["diff", old, newdir, out, "--keys", "doc_id"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (stats["insert"], stats["update"], stats["delete"]) == (0, 1, 1)
    got = {(r["doc_id"], r["change_type"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "delete"), (4, "update")}
