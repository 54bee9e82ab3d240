"""Action-level profiler for registry queries (guide §1: measure first).

Wraps every DataFrame action / writer entry point with a timer that
records the repo-level call site, then runs one or more registry
queries and prints, per query, a table of
    (call site, action, n_calls, total_s)
sorted by total time.  The scheduler-bound lifecycle queries spend
their wall in driver actions (commit round trips) rather than in any
single scan — this attributes that wall line-by-line so the fusion
work targets the right commits.

Usage:
    python tools/profile_query.py <query> [<query> ...] [--sf <dir>]
    python tools/profile_query.py --all [--sf <dir>]
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _callsite() -> str:
    """Innermost stack frame that lives in this repo (skipping this
    profiler module itself)."""
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if fn.startswith(REPO) and not fn.endswith("profile_query.py"):
            rel = os.path.relpath(fn, REPO)
            return f"{rel}:{frame.lineno}"
    return "<external>"


class ActionStats:
    def __init__(self) -> None:
        self.rows: dict[tuple[str, str], list[float]] = defaultdict(
            lambda: [0, 0.0]
        )

    def add(self, site: str, action: str, dt: float) -> None:
        row = self.rows[(site, action)]
        row[0] += 1
        row[1] += dt

    def clear(self) -> None:
        self.rows.clear()

    def report(self) -> str:
        out = [f"{'call site':58s} {'action':22s} {'n':>4} {'total_s':>8}"]
        for (site, action), (n, tot) in sorted(
            self.rows.items(), key=lambda kv: -kv[1][1]
        ):
            out.append(f"{site:58s} {action:22s} {n:>4} {tot:>8.3f}")
        n_all = sum(r[0] for r in self.rows.values())
        t_all = sum(r[1] for r in self.rows.values())
        out.append(f"{'TOTAL':58s} {'':22s} {n_all:>4} {t_all:>8.3f}")
        return "\n".join(out)


STATS = ActionStats()


def _wrap(cls, name: str) -> None:
    orig = getattr(cls, name)

    def wrapped(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            STATS.add(_callsite(), f"{cls.__name__}.{name}",
                      time.perf_counter() - t0)

    wrapped.__name__ = name
    setattr(cls, name, wrapped)


def install() -> None:
    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

    for m in ("count", "collect", "take", "head", "first", "toPandas",
              "toLocalIterator", "isEmpty"):
        if hasattr(DataFrame, m):
            _wrap(DataFrame, m)
    for m in ("save", "parquet", "csv", "json", "text"):
        _wrap(DataFrameWriter, m)
    for m in ("parquet", "load", "json", "csv"):
        _wrap(DataFrameReader, m)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    run_all = "--all" in args
    if run_all:
        args.remove("--all")

    install()
    import __spark_entry__ as entry
    from gedixr_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = list(qs) if run_all else args
    # one warm pass so JVM/parquet-footer caches don't pollute run 1
    next(iter(qs.values()))(spark, sf_dir).count()
    STATS.clear()
    for name in names:
        if name not in qs:
            print(f"unknown query {name!r}")
            continue
        STATS.clear()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.count()
        wall = time.perf_counter() - t0
        print(f"\n=== {name}  wall {wall:.3f}s  (sf {sf_dir}) ===")
        print(STATS.report())


if __name__ == "__main__":
    main()
