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
