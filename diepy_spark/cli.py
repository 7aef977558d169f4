"""CLI: ``python -m diepy_spark.cli import|export|clean|dedup|profile|diff``.

import/export mirror the reference (cli.py:47-144):
  import [--truncate] [--tab] [--config F] SRC... SERVER[.DB[.SCHEMA[.TABLE]]]
  export [--unix] [--windows] [--datestamp] [--timestamp] [--zip] [--config F]
         SERVER.DB.SCHEMA.TABLE OUTFILE

Faithful quirks: 2-part dbpath is server+database (never table — Q3);
export delimiter comes from the output extension, not --tab (Q9). The CLI
runs lenient (log-and-continue per file, Q2); the library API is fail-fast.

clean/dedup are the extension surface's entry points (no reference
analog — the operators behind SURVEY §2.6 X1/X2/X10):
  clean SRC DST [--min-tokens N] [--min-score F] [--max-dup3 F]
        [--jaccard F] [--max-df N] [--text-col C] [--id-col C]
  dedup SRC DST [--method exact|minhash] [--threshold F] [--text-col C]
        [--id-col C]
  profile SRC [--columns a,b,c]           # DQ audit, one JSON line/column
  diff OLD NEW DST --keys k1[,k2] [--compare a,b]  # CDC changeset
SRC is a parquet path/dir (the cluster-scale interchange format); DST is
written as parquet. Each prints a one-line JSON stats summary to stdout.
"""

from __future__ import annotations

import argparse
import logging
import sys

from diepy_spark.core.dbpath import parse_dbpath


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="diepy", description="database import export utility (PySpark engine)")
    sub = p.add_subparsers(dest="command", required=True)

    imp = sub.add_parser("import", help="import file(s) into a database table")
    imp.add_argument("src", nargs="+", help="file(s)/dir/glob; Excel sheet via path.xlsx$Sheet")
    imp.add_argument("dst", help="SERVER[.DATABASE[.SCHEMA[.TABLE]]]")
    imp.add_argument("--truncate", action="store_true", help="delete existing rows first")
    imp.add_argument("--tab", action="store_true", help="tab-delimited input")
    imp.add_argument("--config", default=None, help="config file path")
    imp.add_argument("--strict", action="store_true", help="fail fast instead of log-and-continue")

    exp = sub.add_parser("export", help="export a database table to a file")
    exp.add_argument("src", help="SERVER.DATABASE.SCHEMA.TABLE")
    exp.add_argument("outfile", help="output file (.csv/.tsv/.tab/.txt[.gz]/.xlsx)")
    exp.add_argument("--unix", action="store_true", help="LF line endings")
    exp.add_argument("--windows", action="store_true", help="CRLF line endings")
    exp.add_argument("--datestamp", action="store_true", help="decorate filename with date")
    exp.add_argument("--timestamp", action="store_true", help="decorate filename with date+time")
    exp.add_argument("--zip", action="store_true", help="gzip the output")
    exp.add_argument("--config", default=None, help="config file path")

    cln = sub.add_parser("clean", help="quality-gate + dedup a document corpus (parquet in/out)")
    cln.add_argument("src", help="input parquet path/dir with at least (id, text) columns")
    cln.add_argument("dst", help="output parquet dir for the cleaned corpus")
    cln.add_argument("--min-tokens", type=int, default=5)
    cln.add_argument("--min-score", type=float, default=0.5)
    cln.add_argument("--max-dup3", type=float, default=0.5)
    cln.add_argument("--jaccard", type=float, default=0.2, help="near-dup Jaccard threshold")
    cln.add_argument("--max-df", type=int, default=100, help="stop-shingle document-frequency cap")
    cln.add_argument("--text-col", default="text")
    cln.add_argument("--id-col", default="doc_id")

    ddp = sub.add_parser("dedup", help="deduplicate a document corpus (parquet in/out)")
    ddp.add_argument("src", help="input parquet path/dir")
    ddp.add_argument("dst", help="output parquet dir for the deduplicated corpus")
    ddp.add_argument("--method", choices=["exact", "minhash"], default="exact")
    ddp.add_argument("--threshold", type=float, default=0.5, help="minhash: verified-Jaccard threshold")
    ddp.add_argument("--max-df", type=int, default=100)
    ddp.add_argument("--text-col", default="text")
    ddp.add_argument("--id-col", default="doc_id")

    prf = sub.add_parser(
        "profile", help="data-quality profile of a parquet table (one JSON line per column)"
    )
    prf.add_argument("src", help="input parquet path/dir")
    prf.add_argument(
        "--columns", default=None, help="comma-separated subset (default: all columns)"
    )

    dff = sub.add_parser(
        "diff", help="CDC changeset between two parquet snapshots (parquet out)"
    )
    dff.add_argument("old", help="old snapshot parquet path")
    dff.add_argument("new", help="new snapshot parquet path")
    dff.add_argument("dst", help="output parquet dir for the changeset")
    dff.add_argument("--keys", required=True, help="comma-separated key columns")
    dff.add_argument(
        "--compare", default=None,
        help="comma-separated compared columns (default: all shared non-key)",
    )
    return p


def _cmd_clean(spark, args) -> int:
    import json

    from diepy_spark.operators.corpus import clean_corpus

    df = spark.read.parquet(args.src)
    n_in = df.count()
    out = clean_corpus(
        df,
        text_col=args.text_col,
        id_col=args.id_col,
        min_tokens=args.min_tokens,
        min_score=args.min_score,
        max_dup3=args.max_dup3,
        jaccard_threshold=args.jaccard,
        max_df=args.max_df,
    )
    out.write.mode("overwrite").parquet(args.dst)
    n_out = spark.read.parquet(args.dst).count()
    print(json.dumps({"command": "clean", "docs_in": n_in, "docs_out": n_out,
                      "removed": n_in - n_out, "dst": args.dst}))
    return 0


def _cmd_dedup(spark, args) -> int:
    import json

    from diepy_spark.operators import dedup as D
    from diepy_spark.operators.clustering import dedup_corpus

    df = spark.read.parquet(args.src)
    n_in = df.count()
    if args.method == "exact":
        # min-id representative per identical text (fingerprint aggregate
        # + semi join — never shuffles document text)
        reps = D.exact_representatives(df, args.text_col, args.id_col)
        out = df.join(reps.select(args.id_col), args.id_col, "left_semi")
    else:
        pairs = D.minhash_lsh_pairs(
            df, threshold=args.threshold, max_df=args.max_df,
            text_col=args.text_col, id_col=args.id_col,
        )
        out = dedup_corpus(df, pairs, id_col=args.id_col).drop("cluster")
    out.write.mode("overwrite").parquet(args.dst)
    n_out = spark.read.parquet(args.dst).count()
    print(json.dumps({"command": "dedup", "method": args.method, "docs_in": n_in,
                      "docs_out": n_out, "removed": n_in - n_out, "dst": args.dst}))
    return 0


def _cmd_profile(spark, args) -> int:
    """Per-column audit in ONE scan (the generic form of the declared
    x12_dq_profile): row count, nulls, exact distincts, stringified
    min/max. Output: one JSON line per column, ordered by name."""
    import json

    from pyspark.sql import functions as F

    df = spark.read.parquet(args.src)
    cols = args.columns.split(",") if args.columns else df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"max_{c}"))
    row = df.agg(*aggs).collect()[0]
    for c in sorted(cols):
        print(json.dumps({
            "column": c, "n_rows": row["n_rows"], "n_null": row[f"null_{c}"],
            "n_distinct": row[f"nd_{c}"], "min": row[f"min_{c}"],
            "max": row[f"max_{c}"],
        }))
    return 0


def _cmd_diff(spark, args) -> int:
    import json

    from pyspark.sql import functions as F

    from diepy_spark.operators.merge import snapshot_diff

    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    keys = args.keys.split(",")
    compare = args.compare.split(",") if args.compare else None
    d = snapshot_diff(old, new, keys, compare)
    d.write.mode("overwrite").parquet(args.dst)
    counts = {
        r["change_type"]: r["n"]
        for r in spark.read.parquet(args.dst)
        .groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(json.dumps({
        "command": "diff",
        "insert": counts.get("insert", 0),
        "update": counts.get("update", 0),
        "delete": counts.get("delete", 0),
        "dst": args.dst,
    }))
    return 0


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    args = _build_parser().parse_args(argv)

    from diepy_spark.context import DiepyContext
    from diepy_spark.session import get_spark
    from diepy_spark.sources.writers import decorate_filename

    spark = get_spark("diepy-cli")

    if args.command == "clean":
        return _cmd_clean(spark, args)
    if args.command == "dedup":
        return _cmd_dedup(spark, args)
    if args.command == "profile":
        return _cmd_profile(spark, args)
    if args.command == "diff":
        return _cmd_diff(spark, args)

    if args.command == "import":
        server, database, schema, table = parse_dbpath(args.dst)
        ctx = DiepyContext(spark, server, database, args.config, lenient=not args.strict)
        delimiter = "\t" if args.tab else ","
        for src in args.src:
            ctx.import_path(src, table, schema, delimiter, args.truncate)
        return 0

    server, database, schema, table = parse_dbpath(args.src)
    if not table:
        print(f"error: export needs a 4-part path SERVER.DATABASE.SCHEMA.TABLE, got '{args.src}'", file=sys.stderr)
        return 2
    outfile = decorate_filename(args.outfile, args.datestamp, args.timestamp)
    ctx = DiepyContext(spark, server, database, args.config)
    out = ctx.export_table(table, outfile, schema, unix=args.unix, windows=args.windows, zip=args.zip)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
