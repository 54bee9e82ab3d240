"""Round-13 scale rehearsal: measured evidence for SCALE.md §13.

1. Coalesced CDC churn runs — a 50-upsert catch-up's plan size and
   wall at 1x and 10x rows-per-commit (legs must stay O(1); wall must
   grow far slower than 10x at this scale because the coalesced plan
   amortizes per-commit fixed costs).
2. Metadata-cache effect on a snapshot read loop — storage entry reads
   and recomputed walks, cold vs warm.
3. version_at_timestamp probe count on a 200-version log.

Run:  python tools/r13_rehearsal.py
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, functions as F  # noqa: E402

from gedixr_spark.session import get_spark  # noqa: E402
from gedixr_spark.sinks.versioned import (  # noqa: E402
    commit_append,
    commit_upsert,
    init_versioned,
    metadata_cache_stats,
    read_versioned,
    reset_metadata_cache,
    table_changes,
)

SCRATCH = "/tmp/r13_rehearsal"


def _plan_scans(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Scan parquet")


def bench_coalesced_feed(spark, mult: int) -> dict:
    t = f"{SCRATCH}/feed_x{mult}"
    shutil.rmtree(t, ignore_errors=True)
    init_versioned(spark, t)
    n = 600 * mult
    commit_append(
        spark, t,
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        ).repartition(4),
    )
    for i in range(50):
        commit_upsert(
            spark, t,
            spark.range(i * 3, i * 3 + 3).select(
                F.col("id").alias("k"),
                F.lit(1000 + i).cast("long").alias("val"),
            ),
            keys=["k"],
        )
    best = None
    rows = None
    for _ in range(3):
        t0 = time.perf_counter()
        ch = table_changes(spark, t, 1)
        rows = ch.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "rows_per_commit_mult": mult,
        "feed_rows": rows,
        "plan_parquet_scans": _plan_scans(table_changes(spark, t, 1)),
        "feed_wall_s": round(best, 3),
    }


def bench_cache(spark) -> dict:
    t = f"{SCRATCH}/cache"
    shutil.rmtree(t, ignore_errors=True)
    init_versioned(spark, t)
    for i in range(8):
        commit_append(
            spark, t,
            spark.createDataFrame([Row(k=j, v=j) for j in range(i * 4, i * 4 + 4)]),
        )
    reset_metadata_cache()
    read_versioned(spark, t).count()
    cold = metadata_cache_stats()
    reset_metadata_cache(stats_only=True)
    t0 = time.perf_counter()
    for _ in range(10):
        read_versioned(spark, t).count()
    warm_wall = time.perf_counter() - t0
    warm = metadata_cache_stats()
    return {
        "cold_entry_storage_reads": cold["entry_reads"],
        "warm10_entry_storage_reads": warm["entry_reads"],
        "warm10_entry_cache_hits": warm["entry_hits"],
        "warm10_walks_computed": sum(
            v["computed"] for v in warm["walks"].values()
        ),
        "warm10_walk_calls": sum(v["calls"] for v in warm["walks"].values()),
        "warm10_wall_s": round(warm_wall, 3),
    }


def bench_ts_probes(spark) -> dict:
    from gedixr_spark.sinks.versioned import (
        _atomic_create, _entry_name, _log_dir, version_at_timestamp,
    )

    t = f"{SCRATCH}/tslog"
    shutil.rmtree(t, ignore_errors=True)
    os.makedirs(_log_dir(t))
    for v in range(200):
        e = {"version": v, "op": "create" if v == 0 else "note",
             "ts": 1000.0 + v, "add": [], "remove": [], "schema": None,
             "meta": {}}
        _atomic_create(
            spark, _log_dir(t) + "/" + _entry_name(v),
            json.dumps(e).encode(),
        )
    reset_metadata_cache()
    b = metadata_cache_stats()
    b0 = b["entry_reads"] + b["entry_hits"]
    got = version_at_timestamp(spark, t, 1000.0 + 117)
    a = metadata_cache_stats()
    return {
        "n_versions": 200,
        "answer": got,
        "entry_probes": (a["entry_reads"] + a["entry_hits"]) - b0,
    }


def main():
    spark = get_spark("r13-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "coalesced_feed": [
            bench_coalesced_feed(spark, 1),
            bench_coalesced_feed(spark, 10),
        ],
        "metadata_cache": bench_cache(spark),
        "version_at_timestamp": bench_ts_probes(spark),
    }
    print("REHEARSAL " + json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
