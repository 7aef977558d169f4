"""Excel workbook source/sink bridge (reference core.py:153-186,256-285).

Excel is not a distributed format: the reference streams it row-by-row on a
single machine, and we read it driver-side via pandas/openpyxl, then hand
the rows to Spark as an all-string DataFrame so the SAME inference lattice
and typed-cast projection as CSV applies (one code path for typing).

Addressing: ``path.xlsx$SheetName`` imports a single sheet (core.py:154-158);
a bare path imports every sheet, one table per sheet named after the sheet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from diepy_spark.functions.inference import ColumnSpec, normalize_headers


def split_sheet_address(filepath: str) -> tuple[str, str | None]:
    if "$" in filepath:
        f, sheet = filepath.split("$", 1)
        return f, sheet
    return filepath, None


def read_excel_sheets(path: str, sheet: str | None = None) -> dict[str, "object"]:
    """Read worksheet(s) → {sheet_name: pandas.DataFrame of raw cell values}.

    Prefers pandas/openpyxl (full format coverage incl. date styles); when
    openpyxl is absent, falls back to the stdlib zipfile+xml bridge
    (sources/xlsx_lite.py) — same {sheet: DataFrame} shape, first row as
    header, so the inference lattice downstream is identical."""
    import pandas as pd

    try:
        sheets = pd.read_excel(path, sheet_name=sheet, header=0, dtype=object)
        if sheet is not None:
            return {sheet: sheets}
        return sheets
    except ImportError:
        pass
    from diepy_spark.sources import xlsx_lite

    raw = xlsx_lite.read_workbook(path)
    if sheet is not None:
        if sheet not in raw:
            raise ValueError(f"Worksheet named '{sheet}' not found")
        raw = {sheet: raw[sheet]}
    out = {}
    for name, rows in raw.items():
        header = [("" if v is None else str(v)) for v in (rows[0] if rows else [])]
        out[name] = pd.DataFrame(rows[1:], columns=header, dtype=object)
    return out


def sheet_to_untyped_df(spark: SparkSession, pdf) -> tuple[DataFrame, list[ColumnSpec]]:
    """pandas sheet → (all-string Spark DataFrame, inferred ColumnSpecs).

    The lattice folds over the sheet's raw cell values (the reference
    samples openpyxl internal_value the same way); the Spark frame carries
    stringified cells so sources.files.apply_schema can type it."""
    import pandas as pd

    headers = normalize_headers([str(c) if c is not None else "" for c in pdf.columns])
    specs = [ColumnSpec(h) for h in headers]

    def cell_to_str(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        return str(v)

    str_rows = []
    for row in pdf.itertuples(index=False, name=None):
        for spec, v in zip(specs, row):
            spec.observe(None if (v is None or (isinstance(v, float) and v != v)) else v)
        str_rows.append(tuple(cell_to_str(v) for v in row))

    sdf = spark.createDataFrame(
        pd.DataFrame(str_rows, columns=headers, dtype=object).astype("string"),
        schema=", ".join(f"`{h}` string" for h in headers),
    )
    return sdf, specs
