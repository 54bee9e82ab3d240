"""Distributed read-planning rehearsal (r14 VERDICT #5, SCALE §16):
at N synthetic live files (default includes 1M), compare

  standard   files_for_ranges through the in-memory manifest fast path
             (arrow masks, but the live list + file sets materialize
             as Python objects on the driver), and
  scale      _scale_plan: Spark filters the manifest DataFrame — the
             driver receives survivors only, plus the O(Δ) delta fold

on identical survivor sets, wall time, and DRIVER-RESIDENT PLANNING
STATE (tracemalloc peak of Python allocations during planning — the
measure that must go sublinear in #files for the scale path).

The log is metadata-only (no data files are opened — planning never
scans); a post-checkpoint delta (adds + removes) exercises the fold.

Usage: python tools/scale_plan_rehearsal.py [N ...]   (default 100000 1000000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gedixr_spark.sinks import versioned as vt  # noqa: E402
from tools.manifest_rehearsal import SCHEMA, build_log  # noqa: E402


def add_delta(t: str, n_files: int, cap: int) -> int:
    """Two post-checkpoint entries: one removes 50 checkpoint files,
    one adds 100 fresh files with stats."""
    ld = vt._strip_scheme(vt._log_dir(t))
    removed = [f"v{1:08d}-f{j:07d}.parquet" for j in range(50)]
    e1 = {"version": cap + 1, "op": "compact", "ts": 2000.0,
          "add": [], "remove": removed, "schema": SCHEMA, "meta": {}}
    adds = [f"post-f{j:07d}.parquet" for j in range(100)]
    stats = {
        name: {"__nrows": 100, "k": [(n_files + j) * 100,
                                     (n_files + j) * 100 + 99]}
        for j, name in enumerate(adds)
    }
    e2 = {"version": cap + 2, "op": "append", "ts": 2001.0,
          "add": adds, "remove": [], "schema": SCHEMA,
          "stats": stats, "meta": {}}
    for e in (e1, e2):
        with open(os.path.join(ld, vt._entry_name(e["version"])), "w") as f:
            json.dump(e, f)
    return cap + 2


def plan_mem(fn):
    """(wall seconds, tracemalloc peak bytes, result) of a COLD call."""
    vt.reset_metadata_cache()
    tracemalloc.start()
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return dt, peak, out


def measure(spark, t: str, n_files: int) -> list[dict]:
    # let small smoke runs engage the scale path too
    vt._SCALE_PLAN_MIN_FILES = min(vt._SCALE_PLAN_MIN_FILES, n_files)
    r = vt.checkpoint_log(spark, t, format="parquet")
    assert r["format"] == "parquet" and r["n_live"] == n_files
    cap = add_delta(t, n_files, r["version"])
    # selective range: ~0.1% of checkpoint files + none of the delta
    lo, hi = n_files * 50, n_files * 50 + n_files // 10
    ranges = {"k": (lo, hi)}

    # warm imports / py4j protocol once so tracemalloc measures the
    # PLANNING allocations, not first-call module loading
    vt.files_for_ranges(spark, t, ranges, version=cap)
    vt._scale_plan(spark, t, ranges, cap, skip_unbounded=True)

    std_s, std_peak, std = plan_mem(
        lambda: vt.files_for_ranges(spark, t, ranges, version=cap)
    )
    scl_s, scl_peak, scl = plan_mem(
        lambda: vt._scale_plan(spark, t, ranges, cap, skip_unbounded=True)
    )
    assert scl is not None, "scale plan must engage at this N"
    keep_std, total_std = std
    keep_scl, total_scl, _dvs, _merge = scl
    assert sorted(keep_std) == sorted(keep_scl), "survivor sets differ"
    assert total_std == total_scl
    return [{
        "n_files": n_files, "survivors": len(keep_std),
        "total_live": total_std,
        "std_s": round(std_s, 3), "std_peak_mb": round(std_peak / 2**20, 2),
        "scale_s": round(scl_s, 3),
        "scale_peak_mb": round(scl_peak / 2**20, 2),
    }]


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    from gedixr_spark.session import get_spark

    spark = get_spark("scale-plan-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scale_plan_rehearsal_")
    try:
        for n in ns:
            t = build_log(root, n)
            for rec in measure(spark, t, n):
                print(json.dumps(rec))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
