"""DiepyContext — the library API (reference entry points: core.py:53-84,
115-186, 287-297). A thin orchestrator over a SparkSession + backend:

    ctx = DiepyContext(spark, server="test", config="diepy.ini")
    ctx.import_file("data.csv")             # infer → create → load
    ctx.export_table("data", "out.csv.gz")  # scan → render → write

Error policy: fail-fast by default; ``lenient=True`` restores the
reference's log-and-continue behavior (quirk Q2).
"""

from __future__ import annotations

import glob as globmod
import logging
import os

from pyspark.sql import DataFrame, SparkSession

from diepy_spark.core.database import make_backend
from diepy_spark.functions.inference import (
    SAMPLE_SIZE_DEFAULT,
    infer_from_dataframe,
)
from diepy_spark.sources.excel import read_excel_sheets, sheet_to_untyped_df, split_sheet_address
from diepy_spark.sources.files import apply_schema, is_csv_path, is_excel_path, read_untyped_csv
from diepy_spark.sources.writers import write_csv, write_xlsx

logger = logging.getLogger("diepy_spark")


class DiepyContext:
    def __init__(
        self,
        spark: SparkSession,
        server: str,
        database: str | None = None,
        config: str | None = None,
        lenient: bool = False,
    ):
        self.spark = spark
        self.backend = make_backend(spark, server, database, config)
        self.lenient = lenient

    # ---- import ------------------------------------------------------------

    def import_path(
        self, src: str, table: str | None = None, schema: str | None = None,
        delimiter: str = ",", truncate: bool = False,
    ) -> None:
        """File / directory / glob routing (cli.py:132-144, core.py:71-79)."""
        if os.path.isfile(src) or "$" in src:
            self.import_file(src, table, schema, delimiter, truncate)
        elif os.path.isdir(src):
            for p in sorted(os.listdir(src)):
                full = os.path.join(src, p)
                if not full.endswith(".csv"):
                    continue
                logger.info("Importing: %s", full)
                self.import_file(full, None, schema, delimiter, truncate)
        else:
            for full in sorted(globmod.glob(src)):
                # the reference's glob branch imports only .csv matches
                # (cli.py:140-144), same as the directory branch
                if not full.endswith(".csv"):
                    continue
                self.import_file(full, None, schema, delimiter, truncate)

    def import_file(
        self, filepath: str, table: str | None = None, schema: str | None = None,
        delimiter: str = ",", truncate: bool = False,
        sample_size: int | None = SAMPLE_SIZE_DEFAULT, lenient_dates: bool = False,
    ) -> int | None:
        try:
            if is_excel_path(filepath):
                return self._import_excel(filepath, table, schema, truncate)
            if not table:
                table = os.path.splitext(os.path.basename(filepath))[0]
                if table.endswith((".csv", ".tab", ".tsv", ".txt")):  # x.csv.gz
                    table = os.path.splitext(table)[0]
            raw = read_untyped_csv(self.spark, filepath, delimiter)
            specs = infer_from_dataframe(raw, sample_size)
            if not self.backend.table_exists(table, schema):
                self.backend.create_table(table, specs, schema)
            typed = apply_schema(raw, specs, lenient=lenient_dates)
            self.backend.append(typed, table, schema, truncate=truncate)
            return typed.count()
        except Exception:
            if self.lenient:
                logger.exception("Had some trouble storing %s", filepath)
                return None
            raise

    def _import_excel(
        self, filepath: str, table: str | None, schema: str | None, truncate: bool
    ) -> int | None:
        path, sheet = split_sheet_address(filepath)
        sheets = read_excel_sheets(path, sheet)
        total = 0
        for sheet_name, pdf in sheets.items():
            try:
                tname = table or sheet_name
                if len(pdf) == 0 and len(pdf.columns) == 0:
                    logger.warning("No data found.")
                    continue
                sdf, specs = sheet_to_untyped_df(self.spark, pdf)
                if not self.backend.table_exists(tname, schema):
                    self.backend.create_table(tname, specs, schema)
                typed = apply_schema(sdf, specs)
                self.backend.append(typed, tname, schema, truncate=truncate)
                total += typed.count()
            except Exception:
                if self.lenient:
                    logger.exception("Had trouble importing worksheet: %s", sheet_name)
                    continue
                raise
        return total

    # ---- export ------------------------------------------------------------

    def export_table(
        self, table: str, filename: str, schema: str | None = None,
        unix: bool = False, windows: bool = False, zip: bool = False,
        single_file: bool = True,
    ) -> str:
        df: DataFrame = self.backend.read_table(table, schema)
        if is_excel_path(filename):
            return write_xlsx(df, filename, sheet_name=table)
        return write_csv(df, filename, unix=unix, windows=windows, zip=zip, single_file=single_file)
