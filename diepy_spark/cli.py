"""CLI: ``python -m diepy_spark.cli import|export`` (reference cli.py:47-144).

Flags mirror the reference:
  import [--truncate] [--tab] [--config F] SRC... SERVER[.DB[.SCHEMA[.TABLE]]]
  export [--unix] [--windows] [--datestamp] [--timestamp] [--zip] [--config F]
         SERVER.DB.SCHEMA.TABLE OUTFILE

Faithful quirks: 2-part dbpath is server+database (never table — Q3);
export delimiter comes from the output extension, not --tab (Q9). The CLI
runs lenient (log-and-continue per file, Q2); the library API is fail-fast.
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
    return p


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    args = _build_parser().parse_args(argv)

    from diepy_spark.context import DiepyContext
    from diepy_spark.session import get_spark
    from diepy_spark.sources.writers import decorate_filename

    spark = get_spark("diepy-cli")

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
