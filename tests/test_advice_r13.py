"""Regression tests for the r12 ADVICE findings (round 13).

Three reproducers: read_appended must not silently skip a DV-only
rollback (restore_dv present, add/remove empty), schema ops must touch
the colmap marker BEFORE their commit (crash between the two must not
leave a committed rename invisible), and cursor_position must retry a
missing-offset read instead of surfacing a raw FileNotFoundException
when a concurrent commit's self-trim races the listing.
"""

import pytest
from pyspark.sql import Row

import gedixr_spark.sinks.cursor as cursor_mod
import gedixr_spark.sinks.versioned as versioned_mod
from gedixr_spark.sinks.cursor import commit_cursor, cursor_position
from gedixr_spark.sinks.versioned import (
    _colmap_active,
    commit_append,
    commit_delete,
    init_versioned,
    read_appended,
    read_versioned,
    rename_column,
    rollback,
)


def test_read_appended_raises_on_dv_only_rollback(spark, tmp_path):
    """ADVICE r12 #1: a rollback that only restores DV state (add and
    remove empty, restore_dv present — rolling back a DV delete) must
    RAISE in read_appended, not be skipped as a metadata-only marker:
    the resurrected rows never reach a file-granularity append feed, so
    silence here means silently wrong incremental consumers."""
    table = str(tmp_path / "dv_rollback_feed")
    init_versioned(spark, table)
    commit_append(
        spark, table,
        spark.createDataFrame([Row(k=i, v=i * 10) for i in range(6)]),
    )  # v1
    commit_delete(spark, table, "k < 2", mode="dv")  # v2: DV only
    rb = rollback(spark, table, 1)  # v3: add/remove empty, restore_dv={}
    assert rb["add"] == [] and rb["remove"] == []
    assert "restore_dv" in rb
    # sanity: the rollback really did resurrect the two rows
    assert read_versioned(spark, table).count() == 6
    # the feed range containing ONLY the DV rollback must raise loudly
    with pytest.raises(ValueError, match="file-granularity"):
        read_appended(spark, table, 2)


def test_colmap_marker_lands_before_schema_op_commit(spark, tmp_path):
    """ADVICE r12 #2: the _colmap marker must be durable BEFORE the
    schema-op entry — a crash between the two must fail toward "marker
    without mapping commit" (reads behave as unmapped, harmless), never
    "mapping commit without marker" (a committed rename invisible to
    every read)."""
    table = str(tmp_path / "marker_order")
    init_versioned(spark, table)
    commit_append(
        spark, table,
        spark.createDataFrame([Row(a=1, b=2)]),
    )
    # simulate the crash: the commit itself dies after validation
    real_commit = versioned_mod._commit

    def exploding_commit(*a, **kw):
        raise RuntimeError("simulated crash before the log entry landed")

    versioned_mod._commit = exploding_commit
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            rename_column(spark, table, "a", "a2")
    finally:
        versioned_mod._commit = real_commit
    # the fail-safe direction: marker present, no mapping commit
    assert _colmap_active(spark, table)
    # reads behave as unmapped — same rows, original names
    got = read_versioned(spark, table).collect()
    assert [r.asDict() for r in got] == [{"a": 1, "b": 2}]
    # and the table is not poisoned: a real rename now works end-to-end
    rename_column(spark, table, "a", "a2")
    got = read_versioned(spark, table).collect()
    assert [r.asDict() for r in got] == [{"a2": 1, "b": 2}]


def test_cursor_position_retries_trimmed_offset(spark, tmp_path, monkeypatch):
    """ADVICE r12 #3: a stale offset listing whose tail file was just
    deleted by a concurrent commit's self-trim must re-list and resolve
    the newer offset, not surface a raw FileNotFoundException."""
    table = str(tmp_path / "cursor_trim_race")
    init_versioned(spark, table)
    for k in (1, 2, 3):
        commit_append(spark, table, spark.createDataFrame([Row(k=k)]))
    commit_cursor(spark, table, "c1", 1)   # seq 0
    commit_cursor(spark, table, "c1", 2)   # seq 1 (trim spares prev latest)
    commit_cursor(spark, table, "c1", 3)   # seq 2; self-trim deletes seq 0
    real_list = cursor_mod._list_offsets
    calls = {"n": 0}

    def stale_then_real(spark_, path_, cid_):
        calls["n"] += 1
        if calls["n"] == 1:
            return [0]  # the listing a reader took before the trim landed
        return real_list(spark_, path_, cid_)

    monkeypatch.setattr(cursor_mod, "_list_offsets", stale_then_real)
    assert cursor_position(spark, table, "c1") == 3
    assert calls["n"] >= 2  # it actually hit the stale path and re-listed
