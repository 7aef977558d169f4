"""Golden round-trip: import basic.csv → typed warehouse table → export CSV
(SURVEY §5.2 item 2), plus gzip, tsv, xlsx, directory import, truncate,
and filename decoration."""

import csv
import gzip
import os
from datetime import datetime

import pytest

from diepy_spark.context import DiepyContext
from diepy_spark.sources.writers import decorate_filename
from tests.test_inference import BASIC_CSV


@pytest.fixture()
def ctx(spark, tmp_path):
    ini = tmp_path / "diepy.ini"
    wh = tmp_path / "warehouse"
    ini.write_text(f"[servers]\ntest = {wh}\n")
    return DiepyContext(spark, "test", config=str(ini))


@pytest.fixture()
def basic_file(tmp_path):
    p = tmp_path / "basic.csv"
    p.write_text(BASIC_CSV)
    return str(p)


def test_import_creates_typed_table(ctx, basic_file):
    n = ctx.import_file(basic_file)
    assert n == 3
    df = ctx.backend.read_table("basic")
    types = dict(df.dtypes)
    assert types == {
        "string": "string", "int": "smallint", "float": "double",
        "datetime": "timestamp", "bool": "smallint", "time": "string",
        "date": "date",
    }
    rows = {r["int"]: r for r in df.collect()}
    assert rows[1]["time"] == "12:01:02"
    assert rows[1]["datetime"] == datetime(2013, 10, 11, 13, 4, 5)
    assert rows[2]["datetime"].microsecond == 132500
    assert rows[3]["datetime"] is None and rows[3]["bool"] is None
    assert rows[3]["string"] == "return\n"
    assert rows[2]["string"] == "tricky with the spaces and the, commas"


def test_export_csv_roundtrip(ctx, basic_file, tmp_path):
    ctx.import_file(basic_file)
    out = str(tmp_path / "out.csv")
    ctx.export_table("basic", out, unix=True)
    with open(out, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    byint = {r["int"]: r for r in rows}
    assert byint["1"]["datetime"] == "2013-10-11T13:04:05"  # isoformat, no micros
    assert byint["2"]["datetime"] == "2000-12-12T14:23:45.132500"  # micros kept
    assert byint["3"]["datetime"] == ""  # NULL → empty
    assert byint["1"]["date"] == "2013-10-11"


def test_export_gzip(ctx, basic_file, tmp_path):
    ctx.import_file(basic_file)
    out = str(tmp_path / "out.csv")
    got = ctx.export_table("basic", out, zip=True, unix=True)
    assert got.endswith(".gz")
    with gzip.open(got, "rt") as f:  # documented gzip semantics (Q1 fixed)
        assert f.readline().strip() == "string,int,float,datetime,bool,time,date"


def test_export_tsv_delimiter_by_extension(ctx, basic_file, tmp_path):
    ctx.import_file(basic_file)
    out = str(tmp_path / "out.tsv")
    ctx.export_table("basic", out, unix=True)
    with open(out) as f:
        assert "\t" in f.readline()


def test_truncate_vs_append(ctx, basic_file):
    ctx.import_file(basic_file)
    ctx.import_file(basic_file)  # append
    assert ctx.backend.read_table("basic").count() == 6
    ctx.import_file(basic_file, truncate=True)
    assert ctx.backend.read_table("basic").count() == 3


def test_zip_import(ctx, basic_file, tmp_path):
    """S2: x.csv.zip imports like x.csv (extracted to scratch — Hadoop
    streams can't unzip). The reference admits the extension but reads raw
    bytes (core.py:18-20 vs 237); this path actually works."""
    import zipfile

    src = tmp_path / "basic.csv.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.write(basic_file, "basic.csv")
    n = ctx.import_file(str(src))
    assert n == 3
    df = ctx.backend.read_table("basic")
    assert dict(df.dtypes)["int"] == "smallint"
    assert df.count() == 3


def test_zip_without_delimited_members_rejected(ctx, tmp_path):
    import zipfile

    src = tmp_path / "junk.csv.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("readme.md", "hello")
    with pytest.raises(ValueError, match="no .csv"):
        ctx.import_file(str(src))


def test_glob_import_filters_to_csv(ctx, tmp_path):
    d = tmp_path / "g"
    d.mkdir()
    (d / "t3.csv").write_text("a,b\n1,x\n")
    (d / "notes.txt").write_text("a\n1\n")  # glob branch takes only *.csv (cli.py:140-144)
    ctx.import_path(str(d / "*"))
    assert ctx.backend.table_exists("t3")
    assert not ctx.backend.table_exists("notes")


def test_directory_import_table_per_file(ctx, tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "t1.csv").write_text("a,b\n1,x\n")
    (d / "t2.csv").write_text("a,b\n2,y\n")
    (d / "skip.txt").write_text("a\n1\n")  # dir scan takes only *.csv (core.py:75-77)
    ctx.import_path(str(d))
    assert ctx.backend.table_exists("t1") and ctx.backend.table_exists("t2")
    assert not ctx.backend.table_exists("skip")


def _make_xlsx(path, sheets: dict):
    """Build a fixture workbook: pandas/openpyxl when available, else the
    stdlib bridge — so these tests run (not skip) in openpyxl-less envs."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        with pd.ExcelWriter(path) as w:
            for name, cols in sheets.items():
                pd.DataFrame(cols).to_excel(w, index=False, sheet_name=name)
    except ImportError:
        from diepy_spark.sources import xlsx_lite

        xlsx_lite.write_workbook(
            str(path),
            {
                name: [list(cols)] + [list(r) for r in zip(*cols.values())]
                for name, cols in sheets.items()
            },
        )


def test_xlsx_roundtrip(ctx, basic_file, tmp_path):
    from diepy_spark.sources.excel import read_excel_sheets

    # build an xlsx analog of basic.csv
    src = tmp_path / "book.xlsx"
    _make_xlsx(src, {"people": {"name": ["a", "b"], "n": [1, 40000]}})
    ctx.import_file(str(src))
    df = ctx.backend.read_table("people")
    assert dict(df.dtypes)["n"] == "int"
    assert df.count() == 2

    out = str(tmp_path / "out.xlsx")
    ctx.export_table("people", out)
    back = read_excel_sheets(out, sheet="people")["people"]
    assert sorted(int(v) for v in back["n"].tolist()) == [1, 40000]


def test_single_sheet_addressing(ctx, tmp_path):
    src = tmp_path / "book.xlsx"
    _make_xlsx(src, {"one": {"a": [1]}, "two": {"b": [2]}})
    ctx.import_file(f"{src}$two")
    assert ctx.backend.table_exists("two")
    assert not ctx.backend.table_exists("one")


def test_decorate_filename():
    now = datetime(2026, 8, 13, 14, 5)
    assert decorate_filename("out.csv", datestamp=True, now=now) == "out-2026.08.13.csv"
    assert decorate_filename("out.csv", timestamp=True, now=now) == "out-2026.08.13.1405.csv"
    assert decorate_filename("out.csv.gz", datestamp=True, now=now) == "out-2026.08.13.csv.gz"
    assert decorate_filename("out.csv") == "out.csv"


def test_auto_multiline_quote_census(spark, tmp_path):
    from diepy_spark.sources.files import _needs_multiline, read_untyped_csv

    clean = tmp_path / "clean.csv"
    clean.write_text("a,b\n1,x\n2,y\n")
    quoted = tmp_path / "quoted.csv"
    quoted.write_text('a,b\n1,"line one\nline two"\n2,plain\n')

    # census: clean file -> splittable path; quoted file -> multiLine
    assert _needs_multiline(spark, str(clean)) is False
    assert _needs_multiline(spark, str(quoted)) is True

    # both parse correctly under auto
    c = read_untyped_csv(spark, str(clean))
    assert c.count() == 2 and c.columns == ["a", "b"]
    q = read_untyped_csv(spark, str(quoted)).orderBy("a").collect()
    assert len(q) == 2
    assert q[0]["b"] == "line one\nline two"

    # explicit override skips the probe and still parses the clean file
    assert read_untyped_csv(spark, str(clean), multiline=False).count() == 2
