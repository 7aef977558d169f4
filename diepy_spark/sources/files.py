"""Untyped-file sources and the typed-cast projection.

Reference behavior: CSV/TSV/TXT (optionally .gz/.zip) are streamed as
string dicts (core.py:234-254); typing happens via the inference lattice +
per-cell cast (core.py:374-389). Spark design: `spark.read.csv` with every
column as string (distributed, splittable for plain/bzip2; .gz decompresses
transparently but single-stream per file — document, don't fight), then one
declarative try_cast projection applies the inferred schema. Everything
stays in whole-stage codegen; the optional dateutil path for exotic date
formats is an Arrow-batched pandas UDF, never row-at-a-time Python.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, StringType, TimestampType

from diepy_spark.functions.inference import ColumnSpec, normalize_headers

# Extension recognition, faithful to the reference's regexes (core.py:18-25).
_CSV_RE = re.compile(r".*(\.csv|\.tab|\.tsv|\.txt)(\.gz|\.zip)?$", re.IGNORECASE)
_EXCEL_RE = re.compile(r".*(\.xlsx|\.xls)(\.gz|\.zip)?(\$.*)?$", re.IGNORECASE)


def is_csv_path(p: str) -> bool:
    return bool(_CSV_RE.match(p))


def is_excel_path(p: str) -> bool:
    return bool(_EXCEL_RE.match(p))


def delimiter_for(path: str, default: str = ",") -> str:
    """Extension decides: .tab/.tsv → tab (reference export rule,
    core.py:314-317). Compression suffixes (.gz/.zip) are transparent."""
    base = path
    for suf in (".gz", ".zip"):
        if base.lower().endswith(suf):
            base = base[: -len(suf)]
    if base.endswith(".tab") or base.endswith(".tsv"):
        return "\t"
    return default


def extract_zip_members(path: str) -> list[str]:
    """Extract the delimited members of a ``.zip`` archive to a scratch dir
    and return their paths.

    The reference's regex admits ``x.csv.zip`` (core.py:18-20) but its
    reader opens the raw bytes — zip import is effectively dead there; we
    implement it for real. Zip is not a splittable stream format, so the
    archive is expanded once driver-side (same single-stream bound as .gz);
    at 100 TB the answer is "don't ship zip", and the expansion makes the
    extracted members splittable plain text for the actual scan."""
    import tempfile
    import zipfile

    out = tempfile.mkdtemp(prefix="diepy-zip-")
    with zipfile.ZipFile(path) as zf:
        members = [
            m
            for m in zf.namelist()
            if not m.endswith("/")
            and re.match(r".*(\.csv|\.tab|\.tsv|\.txt)$", m, re.IGNORECASE)
        ]
        if not members:
            raise ValueError(
                f"{path}: zip archive contains no .csv/.tab/.tsv/.txt members"
            )
        for m in members:
            zf.extract(m, out)
    return [os.path.join(out, m) for m in members]


def _needs_multiline(spark: SparkSession, src: str | list[str]) -> bool:
    """Distributed quote census: embedded newlines can only live inside
    QUOTED fields, so a file containing no quote character at all is safe
    to scan in splittable (non-multiLine) mode. The census reads the file
    as plain text — itself splittable — and early-stops at the first
    quote-bearing line; counting quote characters is line-split-agnostic,
    so the census is correct even when quoted newlines DO break text rows."""
    probe = spark.read.text(src).where(F.col("value").contains('"')).limit(1)
    return len(probe.take(1)) > 0


def read_untyped_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    multiline: bool | str = "auto",
) -> DataFrame:
    """All-string scan of a delimited file.

    multiLine parsing (needed for quoted embedded newlines — the
    reference's csv module accepts them, core.py:234-254) makes a file
    UNSPLITTABLE: one task parses everything. The default "auto" runs a
    cheap distributed quote census (_needs_multiline) and keeps the scan
    splittable whenever the file provably contains no quoted fields — on a
    100 TB import that is the difference between a single-core parse and a
    full-cluster one. Pass multiline=True/False to skip the probe when the
    producer is known. Gzip decompresses transparently by extension (a
    single stream per file either way); .zip archives are expanded to
    scratch first (extract_zip_members) since Hadoop input streams can't
    unzip."""
    src = extract_zip_members(path) if path.lower().endswith(".zip") else path
    if multiline == "auto":
        multiline = _needs_multiline(spark, src)
    df = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("multiLine", bool(multiline))
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .csv(src)
    )
    fixed = normalize_headers(list(df.columns))
    return df.toDF(*fixed)


def read_untyped_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """All-string scan of a JSON-Lines file — the S1 import contract
    (typing happens in the inference lattice, never in the reader) applied
    to the other ubiquitous pipeline interchange format.

    primitivesAsString keeps Spark's JSON reader from guessing types; the
    trailing cast flattens anything non-primitive (nested objects/arrays
    surface as their JSON text, exactly how an all-string CSV row would
    carry them). JSON-Lines is newline-delimited by construction, so the
    scan is always splittable — no multiLine census needed. Gzip
    decompresses transparently by extension."""
    df = spark.read.option("primitivesAsString", True).json(path)
    out = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    fixed = normalize_headers(list(out.columns))
    return out.toDF(*fixed)


# Formats accepted by the fast JVM cast path for inferred datetime/date/time
# columns. The reference accepts anything dateutil does; these cover ISO +
# the overwhelmingly common variants. lenient=True switches to dateutil in a
# vectorized pandas UDF for the full acceptance surface.
_TS_FORMATS = (
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy HH:mm",
    "yyyy-MM-dd HH:mm",
)
_DATE_FORMATS = ("yyyy-MM-dd", "MM/dd/yyyy", "M/d/yyyy", "yyyyMMdd")
_TIME_FORMATS = ("HH:mm:ss", "H:mm:ss", "HH:mm", "H:mm", "hh:mm:ss a", "h:mm a")


def _multi_format_ts(col, formats):
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in formats])


def _dateutil_udf(kind: str):
    import pandas as pd
    from dateutil.parser import parse as duparse
    from pyspark.sql.functions import pandas_udf

    if kind == "time":
        @pandas_udf(StringType())
        def conv(s: pd.Series) -> pd.Series:
            def one(v):
                if v is None or v == "":
                    return None
                try:
                    return duparse(str(v)).time().strftime("%H:%M:%S")
                except (ValueError, OverflowError):
                    return None
            return s.map(one)
        return conv

    out_type = DateType() if kind == "date" else TimestampType()

    @pandas_udf(out_type)
    def conv(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None or v == "":
                return None
            try:
                d = duparse(str(v))
                return d.date() if kind == "date" else d
            except (ValueError, OverflowError):
                return None
        return s.map(one)
    return conv


def apply_schema(df: DataFrame, specs: list[ColumnSpec], lenient: bool = False) -> DataFrame:
    """Apply inferred ColumnSpecs to an all-string DataFrame as ONE
    projection: empty string ⇒ NULL (core.py:376-377), then a type-directed
    cast per column. try_cast never throws — unparseable stragglers become
    NULL (fail-fast policy is enforced upstream at inference time)."""
    cols = []
    for spec, raw in zip(specs, df.columns):
        c = F.when(F.col(raw) == "", None).otherwise(F.trim(F.col(raw)))
        t = spec.type or "text"
        if t == "datetime":
            expr = _dateutil_udf("datetime")(c) if lenient else _multi_format_ts(c, _TS_FORMATS)
        elif t == "date":
            # _TS_FORMATS fallback: the lattice's midnight rule
            # (core.py:605-606) classifies datetime-shaped values with a
            # 00:00:00 time part as dates, so the cast must accept both
            # shapes.
            expr = (
                _dateutil_udf("date")(c)
                if lenient
                else F.coalesce(
                    *[F.try_to_timestamp(c, F.lit(f)) for f in _DATE_FORMATS],
                    _multi_format_ts(c, _TS_FORMATS),
                ).cast(DateType())
            )
        elif t == "time":
            # normalized HH:MM:SS string (Spark has no TIME type — SURVEY §7.5)
            expr = (
                _dateutil_udf("time")(c)
                if lenient
                else F.date_format(_multi_format_ts(c, _TIME_FORMATS), "HH:mm:ss")
            )
        elif t == "text":
            expr = F.when(F.col(raw) == "", None).otherwise(F.col(raw))  # keep raw spacing
        elif t == "int":
            # Reference-faithful truncation (core.py is_int/int(value)):
            # typed sources (Excel cells arrive as Python floats) can
            # classify a decimal-valued column as int — int(211445.87)
            # succeeds — and the reference's insert then TRUNCATES toward
            # zero. Direct try_cast first (big integers stay exact; a
            # double round-trip would lose precision past 2^53), the
            # double route only for decimal-shaped stragglers.
            st = spec.spark_type().simpleString()
            expr = F.coalesce(
                c.try_cast(st), c.try_cast("double").try_cast(st)
            )
        else:
            expr = c.try_cast(spec.spark_type().simpleString())
        cols.append(expr.alias(spec.name))
    return df.select(*cols)
