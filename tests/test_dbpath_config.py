"""Unit tests for parse_dbpath (P1) and config resolution (P2/P3),
against the behavior tables in SURVEY §2.4 / §8.Q3."""

import pytest

from diepy_spark.core.config import ConfigError, connection_url
from diepy_spark.core.dbpath import parse_dbpath


@pytest.mark.parametrize(
    "path,expected",
    [
        ("SERVER", ("SERVER", None, None, None)),
        ("SERVER.DB", ("SERVER", "DB", None, None)),  # Q3: 2-part = database, not table
        ("SERVER.DB.SCH", ("SERVER", "DB", "SCH", None)),
        ("SERVER..SCH", ("SERVER", None, "SCH", None)),
        ("SERVER.DB.SCH.TBL", ("SERVER", "DB", "SCH", "TBL")),
        ("SERVER...TBL", ("SERVER", None, None, "TBL")),
        ("SERVER..SCH.TBL", ("SERVER", None, "SCH", "TBL")),
        ("A.B.C.D.E", (None, None, None, None)),  # >4 parts falls through
    ],
)
def test_parse_dbpath(path, expected):
    assert tuple(parse_dbpath(path)) == expected


def test_config_resolution_and_database_append(tmp_path):
    ini = tmp_path / "diepy.ini"
    ini.write_text("[servers]\ntest = /warehouse/root/\n")
    assert connection_url("test", config=str(ini)) == "/warehouse/root/"
    # database appended like the reference: rstrip('/') + '/' + db
    assert connection_url("test", "mydb", str(ini)) == "/warehouse/root/mydb"


def test_config_missing_raises(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HOME", str(tmp_path))
    with pytest.raises(ConfigError):
        connection_url("nope")
