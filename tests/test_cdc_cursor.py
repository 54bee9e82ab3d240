"""r11 VERDICT #1: industrial CDC consumption.

(a) `refresh_incremental_agg_cdc`'s state commit is now a keyed
commit_merge — a small churn on a large state rewrites only the state
files containing churned keys (asserted via table_history add/remove
counts), never the whole state.

(b) `sinks.cursor` — named consumer offsets over `table_changes` with
exactly-once advance: crash-replayed commits no-op, racing workers see
one winner, independent consumers don't interfere.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gedixr_spark.operators.incremental import (
    init_incremental_agg,
    read_incremental_agg_cdc,
    refresh_incremental_agg_cdc,
)
from gedixr_spark.sinks.cursor import (
    commit_cursor,
    consume_changes,
    cursor_position,
    next_changes,
)
from gedixr_spark.sinks.versioned import (
    commit_append,
    commit_delete,
    commit_upsert,
    init_versioned,
    read_versioned,
    table_history,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, g=g, v=v) for (g, i, v) in rows]
    )


# ---------------------------------------------------------------- (a)


def test_small_churn_rewrites_only_churned_state_files(spark, tmp_path):
    """3-key churn on a 10k-key state must merge, not overwrite: the
    state commit's remove set is a strict subset of the state files
    (only those holding churned keys), and its add set is similarly
    small — refresh cost ∝ churned keys, never the key space."""
    src = str(tmp_path / "src")
    st = str(tmp_path / "state")
    init_versioned(spark, src)
    init_incremental_agg(spark, st)
    commit_append(
        spark, src,
        _mk(spark, [(f"g{i:05d}", i, i % 97) for i in range(10_000)])
        .repartition(4),
    )
    refresh_incremental_agg_cdc(spark, src, st, keys=["g"], value_col="v")
    # bootstrap state: range-clustered into several files
    boot = table_history(spark, st)[-1]
    n_state_files = len(boot["add"])
    assert n_state_files >= 2  # the locality assertion needs >1 file
    # churn exactly 3 adjacent keys (range clustering → 1-2 files)
    commit_upsert(
        spark, src,
        _mk(spark, [("g00100", 100, 500), ("g00101", 101, 501),
                    ("g00102", 102, 502)]),
        keys=["doc_id"],
    )
    refresh_incremental_agg_cdc(spark, src, st, keys=["g"], value_col="v")
    e = table_history(spark, st)[-1]
    assert e["op"] == "merge"
    # file-granularity: strictly fewer files touched than the state has
    assert 0 < len(e["remove"]) < n_state_files
    assert len(e["add"]) <= len(e["remove"]) + 1
    # and the law still holds
    got = {
        r["g"]: (r["n_rows"], r["sum"])
        for r in read_incremental_agg_cdc(spark, st)
        .filter(F.col("g").isin("g00100", "g00101", "g09999"))
        .collect()
    }
    assert got["g00100"] == (1, 500.0)
    assert got["g00101"] == (1, 501.0)
    assert got["g09999"] == (1, float(9999 % 97))


def test_merge_based_refresh_handles_retraction_and_insert(spark, tmp_path):
    """Matched keys update in place, fully-retracted keys LEAVE the
    state via when_matched_delete, new keys insert — across both
    delete modes."""
    src = str(tmp_path / "src2")
    st = str(tmp_path / "state2")
    init_versioned(spark, src)
    init_incremental_agg(spark, st)
    commit_append(
        spark, src,
        _mk(spark, [("a", 1, 10), ("a", 2, 20), ("b", 3, 30)]),
    )
    refresh_incremental_agg_cdc(spark, src, st, keys=["g"], value_col="v")
    # delete all of b (cow), half of a (dv), insert c
    commit_delete(spark, src, F.col("g") == "b", mode="cow")
    commit_delete(spark, src, F.col("doc_id") == 1, mode="dv")
    commit_append(spark, src, _mk(spark, [("c", 9, 90)]))
    refresh_incremental_agg_cdc(spark, src, st, keys=["g"], value_col="v")
    got = sorted(
        (r["g"], r["n_rows"], r["sum"])
        for r in read_incremental_agg_cdc(spark, st).collect()
    )
    assert got == [("a", 1, 20.0), ("c", 1, 90.0)]


def test_refresh_with_no_churn_advances_watermark(spark, tmp_path):
    """A refresh over a range whose changes all cancelled must still
    advance the watermark (metadata-only marker) so the next refresh
    doesn't re-diff an ever-growing range."""
    src = str(tmp_path / "src3")
    st = str(tmp_path / "state3")
    init_versioned(spark, src)
    init_incremental_agg(spark, st)
    commit_append(spark, src, _mk(spark, [("a", 1, 10)]))
    refresh_incremental_agg_cdc(spark, src, st, keys=["g"], value_col="v")
    # upsert the identical row: table_changes nets to NOTHING
    commit_upsert(spark, src, _mk(spark, [("a", 1, 10)]), keys=["doc_id"])
    res = refresh_incremental_agg_cdc(
        spark, src, st, keys=["g"], value_col="v"
    )
    assert res["to_version"] > res["from_version"]
    marker = table_history(spark, st)[-1]
    assert marker["add"] == [] and marker["remove"] == []
    assert marker["meta"]["source_version"] == res["to_version"]
    # and the NEXT refresh starts at the advanced watermark
    res2 = refresh_incremental_agg_cdc(
        spark, src, st, keys=["g"], value_col="v"
    )
    assert res2["from_version"] == res["to_version"]
    assert res2["n_keys"] is None  # recognized no-op


# ---------------------------------------------------------------- (b)


def test_cursor_poll_commit_poll_cycle(spark, tmp_path):
    table = str(tmp_path / "t")
    init_versioned(spark, table)
    commit_append(spark, table, _mk(spark, [("a", 1, 10), ("b", 2, 20)]))
    assert cursor_position(spark, table, "job1") is None
    batch = next_changes(spark, table, "job1")
    assert batch["from_version"] == 0
    rows = batch["changes"].collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert len(rows) == 2
    commit_cursor(spark, table, "job1", batch["to_version"])
    assert cursor_position(spark, table, "job1") == batch["to_version"]
    # nothing new → no batch
    again = next_changes(spark, table, "job1")
    assert again["changes"] is None
    # new commit → only the delta
    commit_append(spark, table, _mk(spark, [("c", 3, 30)]))
    nxt = next_changes(spark, table, "job1")
    assert [r["g"] for r in nxt["changes"].collect()] == ["c"]


def test_cursor_crash_replay_consumes_each_version_exactly_once(
    spark, tmp_path
):
    """The r11 'Done =' criterion: a crash-replayed cursor consumes
    each version exactly once. Crash AFTER commit → replayed commit
    no-ops; crash BEFORE commit → same range redelivered, committed
    once."""
    table = str(tmp_path / "t2")
    init_versioned(spark, table)
    commit_append(spark, table, _mk(spark, [("a", 1, 10)]))
    commit_append(spark, table, _mk(spark, [("b", 2, 20)]))

    consumed = []  # (from, to) ranges whose processing COMPLETED

    def process(df, frm, to):
        consumed.append((frm, to, df.count()))

    # cycle 1: consume both versions
    r1 = consume_changes(spark, table, "etl", process)
    assert r1["consumed"] and consumed == [(0, 2, 2)]
    # crash AFTER commit, replay the commit → no-op, position unmoved
    res = commit_cursor(spark, table, "etl", r1["to_version"])
    assert res["op"] == "noop"
    assert cursor_position(spark, table, "etl") == 2
    # crash BEFORE commit: process raises mid-batch
    commit_append(spark, table, _mk(spark, [("c", 3, 30)]))

    def boom(df, frm, to):
        raise RuntimeError("worker died")

    with pytest.raises(RuntimeError):
        consume_changes(spark, table, "etl", boom)
    # cursor unmoved → the SAME range redelivers
    assert cursor_position(spark, table, "etl") == 2
    r2 = consume_changes(spark, table, "etl", process)
    assert r2["consumed"] and consumed[-1] == (2, 3, 1)
    # every version consumed exactly once across the crash-replays
    covered = []
    for frm, to, _ in consumed:
        covered.extend(range(frm + 1, to + 1))
    assert covered == sorted(set(covered)) == [1, 2, 3]


def test_cursor_independent_consumers_and_bounded_catchup(spark, tmp_path):
    table = str(tmp_path / "t3")
    init_versioned(spark, table)
    for i in range(4):
        commit_append(spark, table, _mk(spark, [("g", i, i)]))
    # consumer A catches up in bounded steps of 2 versions
    b1 = next_changes(spark, table, "a", max_versions=2)
    assert (b1["from_version"], b1["to_version"]) == (0, 2)
    commit_cursor(spark, table, "a", b1["to_version"])
    b2 = next_changes(spark, table, "a", max_versions=2)
    assert (b2["from_version"], b2["to_version"]) == (2, 4)
    # consumer B is untouched by A's progress
    assert cursor_position(spark, table, "b") is None
    bb = next_changes(spark, table, "b")
    assert (bb["from_version"], bb["to_version"]) == (0, 4)
    # a consumer may start from a later version explicitly
    bc = next_changes(spark, table, "c", start_version=3)
    assert (bc["from_version"], bc["to_version"]) == (3, 4)


def test_cursor_race_single_winner(spark, tmp_path):
    """Two workers sharing a consumer id racing the same seq: exactly
    one offset entry lands per seq (exclusive-create), and the loser's
    retry no-ops when the winner covered its range."""
    table = str(tmp_path / "t4")
    init_versioned(spark, table)
    commit_append(spark, table, _mk(spark, [("a", 1, 1)]))
    commit_append(spark, table, _mk(spark, [("b", 2, 2)]))
    # worker 1 commits through v1; worker 2 (stale) tries v1 too after
    # worker 1 already advanced to v2 — monotone no-op, never a rewind
    commit_cursor(spark, table, "w", 1)
    commit_cursor(spark, table, "w", 2)
    res = commit_cursor(spark, table, "w", 1)
    assert res["op"] == "noop" and res["processed_through"] == 2
    assert cursor_position(spark, table, "w") == 2


def test_cursor_rejects_bad_consumer_id(spark, tmp_path):
    table = str(tmp_path / "t5")
    init_versioned(spark, table)
    with pytest.raises(ValueError):
        next_changes(spark, table, "../evil")
    with pytest.raises(ValueError):
        next_changes(spark, table, "")


def test_cursor_offsets_self_trim(spark, tmp_path):
    """Long-lived consumers must not accumulate offset files forever:
    each successful advance trims all but the previous entry (only the
    latest is load-bearing; the previous is kept for in-flight
    listers)."""
    import os

    table = str(tmp_path / "trim")
    init_versioned(spark, table)
    for i in range(5):
        commit_append(spark, table, _mk(spark, [("g", i, i)]))
        commit_cursor(spark, table, "poller", i + 1)
    assert cursor_position(spark, table, "poller") == 5
    files = os.listdir(table + "/_cursors/poller")
    assert len(files) <= 2, files


def test_list_and_drop_cursors(spark, tmp_path):
    from gedixr_spark.sinks.cursor import drop_cursor, list_cursors

    table = str(tmp_path / "lc")
    init_versioned(spark, table)
    commit_append(spark, table, _mk(spark, [("a", 1, 1)]))
    commit_append(spark, table, _mk(spark, [("b", 2, 2)]))
    assert list_cursors(spark, table) == {}
    commit_cursor(spark, table, "etl", 1)
    commit_cursor(spark, table, "dashboard", 2)
    assert list_cursors(spark, table) == {"etl": 1, "dashboard": 2}
    assert drop_cursor(spark, table, "etl") is True
    assert drop_cursor(spark, table, "etl") is False
    assert list_cursors(spark, table) == {"dashboard": 2}
    # a re-provisioned consumer under the same id starts fresh
    assert cursor_position(spark, table, "etl") is None
    b = next_changes(spark, table, "etl")
    assert b["from_version"] == 0
