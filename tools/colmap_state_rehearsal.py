"""Round-12 scale rehearsal: column mapping + merge-based CDC state.

Measures the two design points the r12 features claim:

(a) `rename_column` is METADATA-ONLY — its commit time must stay flat
    as the table grows 10x, while the alternative (rewriting files
    under the new name) grows with the data. Also times the first
    post-rename full read (the mapping-translation tax).

(b) `refresh_incremental_agg_cdc`'s merge-based state commit — a
    3-key churn on a 10x bigger key space must NOT rewrite 10x more
    state (file-granularity: only churned-key files), so refresh time
    stays roughly flat while a full overwrite would scale with keys.

Run: python tools/colmap_state_rehearsal.py [--small N] [--reps K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gedixr_spark.operators.incremental import (
        init_incremental_agg, refresh_incremental_agg_cdc,
    )
    from gedixr_spark.session import get_spark
    from gedixr_spark.sinks.versioned import (
        commit_append, commit_upsert, init_versioned, read_versioned,
        rename_column, table_history,
    )

    spark = get_spark("colmap-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    root = tempfile.mkdtemp(prefix="colmap_rehearsal_")

    print("| scale | rows | rename commit (s) | post-rename read (s) |")
    print("|---|---|---|---|")
    for label, n in (("1x", args.small), ("10x", args.small * 10)):
        best_r = best_read = None
        for rep in range(args.reps):
            t = f"{root}/ren_{label}_{rep}"
            init_versioned(spark, t)
            df = spark.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("v"),
                F.sha1(F.col("id").cast("string")).alias("payload"),
            )
            commit_append(spark, t, df.repartition(8))
            t0 = time.perf_counter()
            rename_column(spark, t, "v", "val")
            dt = time.perf_counter() - t0
            t1 = time.perf_counter()
            assert read_versioned(spark, t).count() == n
            rt = time.perf_counter() - t1
            best_r = dt if best_r is None else min(best_r, dt)
            best_read = rt if best_read is None else min(best_read, rt)
        print(f"| {label} | {n} | {best_r:.3f} | {best_read:.2f} |", flush=True)

    print()
    print("| scale | keys | churn | refresh (s) | state files rewritten / total |")
    print("|---|---|---|---|---|")
    for label, nk in (("1x", args.small // 4), ("10x", args.small * 10 // 4)):
        best = None
        rewritten = total = None
        for rep in range(args.reps):
            src = f"{root}/src_{label}_{rep}"
            st = f"{root}/st_{label}_{rep}"
            init_versioned(spark, src)
            init_incremental_agg(spark, st)
            commit_append(
                spark, src,
                spark.range(nk).select(
                    F.col("id").alias("doc_id"),
                    F.concat(F.lit("g"), F.col("id").cast("string")).alias("g"),
                    (F.col("id") % 1001).cast("double").alias("v"),
                ).repartition(8),
            )
            refresh_incremental_agg_cdc(
                spark, src, st, keys=["g"], value_col="v"
            )
            boot = table_history(spark, st)[-1]
            total = len(boot["add"])
            # churn exactly 3 adjacent keys
            upd = spark.createDataFrame(
                [(int(i), f"g{i}", 5000.0) for i in (100, 101, 102)],
                "doc_id long, g string, v double",
            )
            commit_upsert(spark, src, upd, keys=["doc_id"])
            t0 = time.perf_counter()
            refresh_incremental_agg_cdc(
                spark, src, st, keys=["g"], value_col="v"
            )
            dt = time.perf_counter() - t0
            e = table_history(spark, st)[-1]
            rewritten = len(e.get("remove", []))
            best = dt if best is None else min(best, dt)
        print(
            f"| {label} | {nk} | 3 keys | {best:.2f} | {rewritten}/{total} |",
            flush=True,
        )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
