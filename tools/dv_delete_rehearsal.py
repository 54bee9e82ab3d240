"""Deletion-vector scale rehearsal (r10 VERDICT #1 "Done" evidence):
measure that a DV-mode delete costs proportional to DELETED ROWS while
a copy-on-write delete costs proportional to TOUCHED FILES — on the
same table, same predicate, fresh table per run.

Setup per scale: a versioned table built from that scale's lineitem
table in N_FILES round-robin files, so a sparse modular predicate
(l_orderkey % MOD == 1, ~1/MOD of rows) touches EVERY file — the
worst case for copy-on-write (full-table rewrite) and the exact case
DVs exist for. Timed: the commit_delete call alone (build excluded).
A follow-up read is timed too, so the DV anti-join's read-side cost is
on the record next to its write-side win.

Usage: python tools/dv_delete_rehearsal.py [--mod 1000] [--reps 2]
Prints one markdown table row per (scale, mode).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/gedixr_sf1")
SCRATCH = "/tmp/gedixr_dv_rehearsal"
N_FILES = 16


def _build(spark, sf_dir: str, tag: str) -> str:
    """Fresh versioned table from lineitem, N_FILES round-robin files."""
    from gedixr_spark.sinks.versioned import commit_append, init_versioned

    path = os.path.join(SCRATCH, tag)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    init_versioned(spark, path)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # round-robin: every file carries every key range — any predicate
    # touches all N_FILES files (CoW's worst case, DV's design case)
    commit_append(spark, path, li.repartition(N_FILES))
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mod", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from gedixr_spark.session import get_spark
    from gedixr_spark.sinks.versioned import commit_delete, read_versioned

    spark = get_spark("dv-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    scales = [("sf0.1", SRC)]
    if os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        scales.append(("sf1", SF1))
    pred = F.col("l_orderkey") % args.mod == 1
    rows = []
    for label, sf_dir in scales:
        for mode in ("dv", "cow"):
            best_del, best_read = None, None
            n_deleted = files_touched = None
            for rep in range(args.reps):
                path = _build(spark, sf_dir, f"{label}_{mode}_{rep}")
                t0 = time.perf_counter()
                res = commit_delete(spark, path, pred, mode=mode)
                dt = time.perf_counter() - t0
                t1 = time.perf_counter()
                n_after = read_versioned(spark, path).count()
                rt = time.perf_counter() - t1
                best_del = dt if best_del is None else min(best_del, dt)
                best_read = rt if best_read is None else min(best_read, rt)
                # a zero-match predicate returns a noop dict with no
                # "meta" — guard rather than KeyError mid-rehearsal
                meta = res.get("meta", {})
                if mode == "dv":
                    n_deleted = meta.get("n_deleted", 0)
                    files_touched = 0
                else:
                    files_touched = meta.get("n_files_rewritten", 0)
                    n_deleted = None
                assert n_after > 0
            rows.append(
                (label, mode, best_del, best_read, n_deleted, files_touched)
            )
            print(
                f"{label:6s} {mode:3s} delete={best_del:6.2f}s "
                f"read={best_read:6.2f}s deleted={n_deleted} "
                f"files_rewritten={files_touched}",
                flush=True,
            )
    print("\n| scale | mode | delete commit (s) | snapshot read (s) | files rewritten |")
    print("|---|---|---|---|---|")
    for label, mode, d, r, nd, ft in rows:
        print(f"| {label} | {mode} | {d:.2f} | {r:.2f} | {ft} |")
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
