"""Round-13 tool-surface tests.

Pins the `tools/compare_bench.py` sentinel normalization (VERDICT r12 #3):
a uniform machine-speed shift between two captures — visible as a shifted
but internally flat sentinel series — must NOT read as per-query
regressions, while the same shift WITHOUT a sentinel on one side (raw
mode) must still be flagged, so the gate keeps teeth on sentinel-less
baselines.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(HERE, "tools", "compare_bench.py")


def _capture(queries, sentinel_sec, value):
    return {
        "metric": "total_query_sec",
        "value": value,
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "sentinel": [
            {"at": at, "sec": s}
            for at, s in zip(["start", "x1", "x2", "end"], sentinel_sec)
        ],
    }


def _run(new_path, old_path, ratio="1.5"):
    r = subprocess.run(
        [sys.executable, TOOL, str(new_path), str(old_path), ratio],
        capture_output=True,
        text=True,
    )
    return r.returncode, r.stdout


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return p


def test_sentinel_normalization_absorbs_uniform_machine_shift(tmp_path):
    # old capture on a machine running 0.55x as slow == new 1.8x "slower"
    # raw, which would trip the 1.5x gate on every query over the floor.
    qs_old = {"q_heavy": 2.0, "q_mid": 1.0, "q_tiny": 0.1}
    shift = 1.8
    qs_new = {k: round(v * shift, 3) for k, v in qs_old.items()}
    old = _capture(qs_old, [0.30, 0.25, 0.27, 0.26], 3.1)
    new = _capture(qs_new, [round(s * shift, 3) for s in
                            [0.30, 0.25, 0.27, 0.26]], 3.1 * shift)
    rc, out = _run(_write(tmp_path, "new.json", new),
                   _write(tmp_path, "old.json", old))
    assert rc == 0, out
    assert "REGRESSION" not in out
    assert "sentinel normalization" in out
    m = re.search(r"old timings scaled by ([0-9.]+)x", out)
    assert m and abs(float(m.group(1)) - shift) < 0.01, out


def test_real_regression_survives_normalization(tmp_path):
    # same machine shift, but one query ALSO genuinely regressed 2x on
    # top of it — normalization must not hide it.
    qs_old = {"q_heavy": 2.0, "q_mid": 1.0}
    shift = 1.8
    qs_new = {"q_heavy": round(2.0 * shift * 2.0, 3),
              "q_mid": round(1.0 * shift, 3)}
    old = _capture(qs_old, [0.30, 0.25, 0.27, 0.26], 3.0)
    new = _capture(qs_new, [round(s * shift, 3) for s in
                            [0.30, 0.25, 0.27, 0.26]], 9.0)
    rc, out = _run(_write(tmp_path, "new.json", new),
                   _write(tmp_path, "old.json", old))
    assert rc == 1, out
    assert out.count("REGRESSION") == 1
    assert "q_heavy" in out


def test_raw_mode_when_sentinel_missing(tmp_path):
    # old side has no sentinel -> gate must run raw and flag the shift.
    qs_old = {"q_heavy": 2.0}
    qs_new = {"q_heavy": 3.6}
    old = _capture(qs_old, [], 2.0)
    del old["sentinel"]
    new = _capture(qs_new, [0.5, 0.5, 0.5, 0.5], 3.6)
    rc, out = _run(_write(tmp_path, "new.json", new),
                   _write(tmp_path, "old.json", old))
    assert rc == 1, out
    assert "REGRESSION q_heavy" in out
    assert "gate runs raw" in out


# ---- robust.py hardening (ADVICE r12) ----------------------------------

import pytest


def test_multi_quantile_rejects_non_identifier_metric(spark):
    from diepy_spark.operators.robust import freq_quantile_cont_multi

    df = spark.range(5).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="bare identifier"):
        freq_quantile_cont_multi(df, "g", {"bad'name": ("v", 0.5)})


def test_multi_quantile_group_containing_delimiter(spark):
    """The composite running-sum key is a STRUCT, not a '\\x1f' concat —
    group values containing the old delimiter must not collide or
    collapse (ADVICE r12)."""
    from diepy_spark.operators.robust import freq_quantile_cont_multi

    rows = [
        ("a\x1fq50", 1.0), ("a\x1fq50", 2.0), ("a\x1fq50", 3.0),
        ("a", 10.0), ("a", 20.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r["q50"]
        for r in freq_quantile_cont_multi(
            df, "g", {"q50": ("v", 0.5)}
        ).collect()
    }
    assert got == {"a\x1fq50": 2.0, "a": 15.0}


def test_freq_median_weight_col_matches_expanded_rows(spark):
    """freq_median(weight_col=) over pre-aggregated (group, value, count)
    rows must be BIT-IDENTICAL to the unweighted call over the expanded
    raw rows (the r13 one-pass re-plan behind x7_stream_outliers rests on
    this): a value with multiplicity w contributes w to its histogram
    frequency either way. Covers odd/even counts, ties, negative values,
    and a weight-1 group."""
    from pyspark.sql import functions as F

    from diepy_spark.operators.robust import freq_median

    rows = [
        ("a", -5), ("a", -5), ("a", 2), ("a", 7),
        ("b", 1), ("b", 1), ("b", 1), ("b", 9), ("b", 9),
        ("c", 42),
    ]
    raw = spark.createDataFrame(rows, "g string, v bigint")
    freqs = raw.groupBy("g", "v").agg(F.count(F.lit(1)).alias("w"))
    plain = {r["g"]: r["med"] for r in freq_median(raw, "g", "v").collect()}
    weighted = {
        r["g"]: r["med"]
        for r in freq_median(freqs, "g", "v", weight_col="w").collect()
    }
    assert plain == weighted == {"a": -5, "b": 1, "c": 42}
