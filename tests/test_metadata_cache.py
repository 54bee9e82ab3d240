"""Session-scoped metadata caches (r12 VERDICT #2).

Log entries are immutable once written, so (path, version) keys are
stable for a table's lifetime; the caches must make repeated walks
free WITHOUT changing any result — including across the one event that
can change a key's meaning: re-creating a table at the same path
(bench scratch dirs are wiped and rebuilt per run).
"""

import shutil

from pyspark.sql import Row

from gedixr_spark.sinks.versioned import (
    checkpoint_log,
    commit_append,
    commit_upsert,
    expire_log,
    init_versioned,
    metadata_cache_stats,
    read_versioned,
    rename_column,
    reset_metadata_cache,
    table_changes,
)


def _build(spark, table, n=3):
    init_versioned(spark, table)
    for i in range(n):
        commit_append(
            spark, table,
            spark.createDataFrame(
                [Row(k=j, v=j * 10) for j in range(i * 4, i * 4 + 4)]
            ),
        )


def test_warm_read_does_zero_entry_reads(spark, tmp_path):
    table = str(tmp_path / "warm_read")
    _build(spark, table)
    reset_metadata_cache()
    assert read_versioned(spark, table).count() == 12
    cold = metadata_cache_stats()
    assert cold["entry_reads"] > 0
    assert read_versioned(spark, table).count() == 12
    warm = metadata_cache_stats()
    # the second read planned entirely from cache: no storage entry
    # read, and no walk re-computed
    assert warm["entry_reads"] == cold["entry_reads"]
    for kind, s in warm["walks"].items():
        assert s["computed"] == cold["walks"][kind]["computed"], kind


def test_walks_per_commit_drop_at_least_2x(spark, tmp_path):
    """The r12 adjudication criterion: across a mapped-table lifecycle
    (commits + snapshot reads + a CDC range), at most half the walk
    CALLS actually replay the log — the rest are cache hits."""
    table = str(tmp_path / "walk_counts")
    _build(spark, table)
    rename_column(spark, table, "v", "val")
    commit_upsert(
        spark, table,
        spark.createDataFrame([Row(k=1, val=111), Row(k=5, val=555)]),
        keys=["k"],
    )
    reset_metadata_cache(stats_only=True)
    reset_metadata_cache()
    read_versioned(spark, table).count()
    read_versioned(spark, table, version=3).count()
    table_changes(spark, table, 0).count()
    s = metadata_cache_stats()
    calls = sum(v["calls"] for v in s["walks"].values())
    computed = sum(v["computed"] for v in s["walks"].values())
    assert calls > 0
    assert computed * 2 <= calls, s["walks"]


def test_cache_evicts_on_table_recreation(spark, tmp_path):
    """Wipe-and-recreate at the same path (the bench scratch-dir
    pattern) must never serve the old table's metadata."""
    table = str(tmp_path / "recreate")
    _build(spark, table, n=2)
    assert read_versioned(spark, table).count() == 8  # caches populated
    shutil.rmtree(table)
    init_versioned(spark, table)
    commit_append(
        spark, table, spark.createDataFrame([Row(a="x"), Row(a="y")])
    )
    df = read_versioned(spark, table)
    assert df.columns == ["a"]
    assert df.count() == 2


def test_new_commits_visible_through_cache(spark, tmp_path):
    table = str(tmp_path / "growing")
    _build(spark, table, n=2)
    assert read_versioned(spark, table).count() == 8
    commit_append(
        spark, table, spark.createDataFrame([Row(k=100, v=1000)])
    )
    assert read_versioned(spark, table).count() == 9
    # time travel to the cached older cap still exact
    assert read_versioned(spark, table, version=2).count() == 8


def test_expire_log_evicts_entries_and_reads_survive(spark, tmp_path):
    table = str(tmp_path / "expire_cache")
    _build(spark, table, n=3)
    read_versioned(spark, table).count()  # warm the caches
    checkpoint_log(spark, table)
    expire_log(spark, table)
    # post-expiry reads replay from the checkpoint — still exact
    assert read_versioned(spark, table).count() == 12
