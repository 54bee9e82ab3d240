"""Cursor-aware retention (r12 VERDICT #1): `expire_log` and
`vacuum_versioned` must not silently strand registered CDC consumers.

- expire_log REFUSES (naming the consumers) while any cursor's
  processed_through sits below the cutoff; drop_cursor or force=True
  unblocks it; a consumer exactly AT the cutoff is safe and still
  reads its next range after expiry.
- vacuum_versioned extends its retained set to every data file and
  delete vector a pending table_changes range still needs, so a
  lagging consumer's catch-up scan survives the vacuum — and once the
  consumer commits past the churn, the next vacuum collects it.
"""

import pytest
from pyspark.sql import Row

from gedixr_spark.sinks.cursor import (
    commit_cursor,
    consume_changes,
    drop_cursor,
    next_changes,
)
from gedixr_spark.sinks.versioned import (
    checkpoint_log,
    commit_append,
    commit_upsert,
    expire_log,
    init_versioned,
    live_files,
    table_changes,
    vacuum_versioned,
)


def _rows(n0, n1, tag):
    return [Row(k=i, v=f"{tag}{i}") for i in range(n0, n1)]


def _build(spark, table, n_commits=4):
    init_versioned(spark, table)
    for i in range(n_commits):
        commit_append(
            spark, table, spark.createDataFrame(_rows(i * 3, i * 3 + 3, "a"))
        )


def test_expire_refuses_while_cursor_lags(spark, tmp_path):
    table = str(tmp_path / "expire_lag")
    _build(spark, table)  # versions 0..4
    commit_cursor(spark, table, "slow", 1)   # lags
    commit_cursor(spark, table, "fast", 4)   # at the tip
    checkpoint_log(spark, table)             # cutoff = 4
    with pytest.raises(ValueError, match="slow@1"):
        expire_log(spark, table)
    # nothing was deleted — the refusal is atomic
    assert table_changes(spark, table, 1).count() > 0
    # retiring the dead consumer unblocks expiry
    assert drop_cursor(spark, table, "slow")
    expired = expire_log(spark, table)
    assert expired == [0, 1, 2, 3]


def test_expire_force_overrides(spark, tmp_path):
    table = str(tmp_path / "expire_force")
    _build(spark, table)
    commit_cursor(spark, table, "slow", 1)
    checkpoint_log(spark, table)
    expired = expire_log(spark, table, force=True)
    assert expired == [0, 1, 2, 3]


def test_consumer_at_cutoff_boundary_survives_expiry(spark, tmp_path):
    """A crash-replayed consumer exactly AT the cutoff must not block
    expiry, and must still read its next range afterwards."""
    table = str(tmp_path / "expire_boundary")
    _build(spark, table)  # versions 0..4
    commit_cursor(spark, table, "edge", 4)
    checkpoint_log(spark, table)  # cutoff = 4
    expire_log(spark, table)      # no refusal: edge is at the cutoff
    # new data arrives; the boundary consumer polls and consumes it
    commit_append(spark, table, spark.createDataFrame(_rows(100, 103, "b")))
    batch = next_changes(spark, table, "edge")
    assert (batch["from_version"], batch["to_version"]) == (4, 5)
    got = {r["k"] for r in batch["changes"].collect()}
    assert got == {100, 101, 102}


def test_vacuum_retains_pending_cursor_range(spark, tmp_path):
    table = str(tmp_path / "vacuum_cursor")
    init_versioned(spark, table)
    commit_append(spark, table, spark.createDataFrame(_rows(0, 6, "a")))  # v1
    # consumer reads through v1 and stalls
    commit_cursor(spark, table, "c1", 1)
    v1_files = set(live_files(spark, table, 1))
    # v2: upsert rewrites the v1 file (its old side is what the
    # consumer's pending diff leg must still scan)
    commit_upsert(
        spark, table,
        spark.createDataFrame([Row(k=1, v="UP1"), Row(k=4, v="UP4")]),
        keys=["k"],
    )
    # the upsert rewrote only the files containing keys 1/4 — those are
    # exactly what the consumer's pending diff leg must still scan
    rewritten = v1_files - set(live_files(spark, table))
    assert rewritten
    # cursor-aware vacuum keeps the old slice alive
    deleted = vacuum_versioned(spark, table, keep_last=1, retention_hours=0)
    assert not (set(deleted) & rewritten)
    # the lagging consumer's catch-up works end-to-end
    seen = {}

    def process(df, frm, to):
        for r in df.collect():
            seen.setdefault(r["_change_type"], set()).add(r["k"])

    res = consume_changes(spark, table, "c1", process)
    assert res["consumed"] and res["to_version"] == 2
    assert seen["update_preimage"] == {1, 4}
    assert seen["update_postimage"] == {1, 4}
    # consumer caught up: the next vacuum now collects the old slice
    deleted = vacuum_versioned(spark, table, keep_last=1, retention_hours=0)
    assert rewritten <= set(deleted)


def test_vacuum_respect_cursors_false_keeps_old_behavior(spark, tmp_path):
    table = str(tmp_path / "vacuum_nocursor")
    init_versioned(spark, table)
    commit_append(spark, table, spark.createDataFrame(_rows(0, 6, "a")))
    commit_cursor(spark, table, "c1", 1)
    v1_files = set(live_files(spark, table, 1))
    commit_upsert(
        spark, table, spark.createDataFrame([Row(k=1, v="UP")]), keys=["k"]
    )
    rewritten = v1_files - set(live_files(spark, table))
    assert rewritten
    deleted = vacuum_versioned(
        spark, table, keep_last=1, retention_hours=0, respect_cursors=False
    )
    assert rewritten <= set(deleted)
