"""Dump `.explain("formatted")` for registry queries to files.

Usage:
    python tools/dump_plans.py <outdir> [--sf <dir>] [query ...]

With no query names, dumps every registry query. Lifecycle queries
execute their commit phases as a side effect of building the returned
DataFrame — the dumped plan is the final read, which is what the
driver times with .count() after the body ran.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    outdir = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from gedixr_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = args or list(qs)
    for name in names:
        if name not in qs:
            print(f"unknown query {name!r}")
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 — diagnostic tool
            plan = f"ERROR {type(ex).__name__}: {ex}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} bytes")


if __name__ == "__main__":
    main()
