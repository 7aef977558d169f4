"""Per-query optimization probe (guide §1): isolate one or more declared
queries in a fresh session and split their cost into
  build    — Python-side plan construction (fn(spark, sf_dir))
  analyze  — Catalyst analysis/optimization (df.explain to a buffer)
  run1/run2— noop-sink materialization, cold then warm
and optionally dump .explain("formatted") to a file.

Usage: python tools/probe_query.py [--plans DIR] [--sf SF_DIR] name [name...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diepy_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    if args and args[0] == "--plans":
        plans_dir = args[1]
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("diepy-spark-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (uncounted), same as bench.py
    qs["r9_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df2 = fn(spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        plan = buf.getvalue()
        n_exch = plan.count("Exchange")
        n_py = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
        print(
            f"{name}: build={t1-t0:.2f}s analyze={t2-t1:.2f}s "
            f"run1={t3-t2:.2f}s run2={t4-t3:.2f}s "
            f"plan_lines={len(plan.splitlines())} exchanges={n_exch} pyeval={n_py}",
            flush=True,
        )
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
