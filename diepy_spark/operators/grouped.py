"""Grouped Pandas-UDF operators (applyInPandas) — the escape hatch for
per-group computations Spark's built-in aggregates can't express (model
fits, per-group numerics, custom reducers). SURVEY §2.6 X8 surface.

Pattern notes for 100 TB:
- applyInPandas shuffles by the group key and hands each group to Python
  as ONE Arrow batch — groups must fit in executor memory. Fine for
  per-language / per-source rollups (bounded group count, bounded group
  size after pre-aggregation); wrong for per-token groups (use built-ins).
- Arithmetic inside the UDF should accumulate in exact integer space where
  possible so results are reproducible regardless of row order within the
  group (pandas int64 sums below are exact; the only float op is the final
  division — bit-identical to the oracle's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def group_linfit(
    df: DataFrame, group_col: str, x_col: str, y_col: str, round_to: int = 6
) -> DataFrame:
    """Per-group ordinary-least-squares line fit y ~ a*x + b via
    applyInPandas. Returns (group, n, slope, intercept), slope/intercept
    rounded; degenerate groups (a single x value) fit as NULL.

    The normal-equation sums (Σx, Σy, Σxy, Σx²) are computed in int64 —
    exact, order-independent — so the single float division at the end is
    bit-identical to a SQL oracle using the same closed form (NOT
    regr_slope, whose streaming accumulation is engine-specific)."""
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[group_col].iloc[0]
        x = pdf[x_col].astype("int64")
        y = pdf[y_col].astype("int64")
        n = len(pdf)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        den = n * sxx - sx * sx
        if den == 0:  # degenerate group (single x value): NULL fit
            slope = None
            intercept = None
        else:
            slope = round((n * sxy - sx * sy) / den, round_to)
            intercept = round((sy - ((n * sxy - sx * sy) / den) * sx) / n, round_to)
        return pd.DataFrame(
            {
                group_col: [g],
                "n": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return df.select(group_col, x_col, y_col).groupBy(group_col).applyInPandas(
        fit, schema=f"{group_col} string, n bigint, slope double, intercept double"
    )
