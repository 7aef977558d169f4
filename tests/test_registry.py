"""Regression tests for the localize-rewrite path (sources/registry.py).

Every bench number depends on it: driver testdata files hold ONE parquet
row group, and Spark parallelizes scans at row-group granularity — without
the rewrite, a 60k+-row scan decodes on one core and serializes every
downstream plan until its first shuffle."""

import os

from diepy_spark.sources.registry import _localized_dir, load_table

SF = "/root/testdata/sf0.01"


def test_big_single_rowgroup_table_is_localized(spark):
    df = load_table(spark, SF, "lineitem")  # 60k rows, 1 row group at source
    files = df.inputFiles()
    assert len(files) > 1, "localize-rewrite regressed: scan is single-file again"
    assert all("diepy-local-" in f for f in files)
    # byte-identical data: same count as the raw source
    raw = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    assert df.count() == raw.count()


def test_small_table_not_localized(spark):
    df = load_table(spark, SF, "nation")  # 25 rows: rewrite would be waste
    files = df.inputFiles()
    assert len(files) == 1 and "diepy-local-" not in files[0]


def test_localize_is_cached_across_calls(spark):
    load_table(spark, SF, "lineitem")
    target = _localized_dir(SF, "lineitem")
    mtime = os.path.getmtime(target)
    load_table(spark, SF, "lineitem")  # second call must reuse, not rewrite
    assert os.path.getmtime(target) == mtime


def test_events_ns_timestamps_become_microsecond_timestamps(spark):
    df = load_table(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.where("ts IS NULL").count() == 0
