"""Headline benchmark: runs the contract queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full query execution to a count-style sink (collect of an
aggregated summary) so scan+compute are measured but driver transfer of
giant results is not dominated by pickling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from gedixr_spark.session import get_spark

    spark = get_spark("gedixr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    # warm the JVM + file-system caches once with the cheapest query,
    # then the Python/Arrow worker pool with a UDF-bearing query —
    # otherwise the first Arrow query in the run pays worker spin-up
    # (~2-3 s) and its number measures the host, not the plan
    next(iter(qs.values()))(spark, sf_dir).count()
    for warm_q in ("spatial_joins", "spatial_join_holed"):
        if warm_q in qs:
            qs[warm_q](spark, sf_dir).count()
            break
    # warm the WHOLE Arrow worker pool, not just one worker: a trivial
    # pandas_udf over one partition per core spins up every Python
    # worker the pool will reuse, so the first pandas_udf query in the
    # run doesn't pay 32× worker spin-up (r5 driver record showed the
    # Arrow family 2-3s over its steady state; VERDICT r5 #2a)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm_pool(x):
        return x

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(100_000, numPartitions=n_cpus).select(
        _warm_pool("id")
    ).count()
    # warm EVERY base table the queries touch (lineitem-derived views are
    # warmed above): first-touch parquet IO showed up as 5-13 s spread on
    # dedup_exact (cold documents.parquet) in the r4 driver run
    for tbl in ("documents", "embeddings", "events"):
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    # Derived-view caching was evaluated and deliberately NOT adopted:
    # caching the shared shots_l2a/l2b/raw-table fragments makes narrow
    # scan-bound queries ~2× faster (filter_stats 1.09→0.50 s) but
    # evaluating the wide shingle/minhash expressions over an
    # InMemoryTableScan is ~2× SLOWER than over the native parquet scan
    # (dedup_apply 2.3→5.2 s), and the TOTAL is a wash within host
    # noise (±1 s of 52 s). Uncached also keeps per-query numbers
    # comparable across rounds and keeps pushdown/pruning in the
    # measured plans.

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for name, fn in qs.items():
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # force full execution without collecting wide results
            n = df.count()
            samples.append(time.perf_counter() - t0)
            assert n >= 0
        # min-of-N: strips JIT/codegen warmup + transient host
        # contention from the per-query number; spread (max-min)
        # makes the remaining in-run variance auditable per query
        timings[name] = round(min(samples), 4)
        spreads[name] = round(max(samples) - min(samples), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Two lines, in this order ON PURPOSE. The driver captures a bounded
    # TAIL of stdout and parses the FINAL line as the metric record; r4's
    # record was lost because spread/runs_per_query grew the single line
    # past the capture window and truncated its head. Diagnostics first,
    # compact 3-decimal metric line LAST — keep it that way.
    print(
        json.dumps(
            {
                "runs_per_query": runs,
                "spread": {k: round(v, 3) for k, v in spreads.items()},
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "gedixr_spark_contract_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
