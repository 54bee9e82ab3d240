"""Multi-table atomic publish catalog (sinks/catalog.py): readers
always observe a CONSISTENT cross-table snapshot, publish is
optimistic-concurrency atomic on the same CommitGuard primitive as
table commits, and compare-and-publish serializes cross-table
read-modify-write."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from gedixr_spark.sinks.catalog import (
    catalog_history,
    init_catalog,
    publish,
    publish_latest,
    read_pins,
    read_table,
)
from gedixr_spark.sinks.versioned import (
    ConcurrentCommitError,
    commit_append,
    init_versioned,
)


def _mk(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows])


@pytest.fixture
def two_tables(spark, tmp_path):
    docs, idx = str(tmp_path / "docs"), str(tmp_path / "idx")
    init_versioned(spark, docs)
    init_versioned(spark, idx)
    commit_append(spark, docs, _mk(spark, [(1, "d1"), (2, "d2")]))  # v1
    commit_append(spark, idx, _mk(spark, [(1, "i1")]))  # v1
    return docs, idx


def _snap(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_consistent_snapshot_survives_unpublished_table_advance(
    spark, tmp_path, two_tables
):
    """The headline guarantee: a writer advances `docs` but crashes
    before publishing — catalog readers stay on the previous
    CONSISTENT (docs, index) pair, never a torn one."""
    docs, idx = two_tables
    cat = str(tmp_path / "cat")
    init_catalog(spark, cat)
    publish_latest(spark, cat, {"docs": docs, "index": idx})

    assert _snap(read_table(spark, cat, "docs")) == [(1, "d1"), (2, "d2")]
    assert _snap(read_table(spark, cat, "index")) == [(1, "i1")]

    # writer advances docs to v2... and "crashes" before publish
    commit_append(spark, docs, _mk(spark, [(3, "d3")]))
    assert _snap(read_table(spark, cat, "docs")) == [(1, "d1"), (2, "d2")]

    # recovery publishes both docs v2 and the rebuilt index atomically
    commit_append(spark, idx, _mk(spark, [(3, "i3")]))
    publish_latest(spark, cat, {"docs": docs, "index": idx})
    assert _snap(read_table(spark, cat, "docs")) == [
        (1, "d1"), (2, "d2"), (3, "d3"),
    ]
    assert _snap(read_table(spark, cat, "index")) == [(1, "i1"), (3, "i3")]

    # catalog time travel: version 1 still reads the OLD pair of BOTH
    assert _snap(read_table(spark, cat, "docs", catalog_version=1)) == [
        (1, "d1"), (2, "d2"),
    ]
    assert _snap(read_table(spark, cat, "index", catalog_version=1)) == [
        (1, "i1"),
    ]


def test_partial_publish_keeps_other_pins(spark, tmp_path, two_tables):
    docs, idx = two_tables
    cat = str(tmp_path / "cat")
    init_catalog(spark, cat)
    publish_latest(spark, cat, {"docs": docs, "index": idx})
    commit_append(spark, docs, _mk(spark, [(3, "d3")]))
    publish(spark, cat, {"docs": {"path": docs, "version": None}})
    pins = read_pins(spark, cat)
    assert pins["docs"]["version"] == 2
    assert pins["index"]["version"] == 1  # untouched pin carried over


def test_validation_rejects_bogus_pins_and_names(spark, tmp_path, two_tables):
    docs, idx = two_tables
    cat = str(tmp_path / "cat")
    init_catalog(spark, cat)
    with pytest.raises(ValueError, match="not in the table log"):
        publish(spark, cat, {"docs": {"path": docs, "version": 99}})
    publish_latest(spark, cat, {"docs": docs})
    with pytest.raises(ValueError, match="not pinned"):
        read_table(spark, cat, "index")
    with pytest.raises(ValueError, match="does not exist"):
        read_pins(spark, cat, version=7)


def test_compare_and_publish_detects_stale_basis(spark, tmp_path, two_tables):
    """A refresh job derived its index from docs v1; a faster publisher
    moved the catalog to docs v2 meanwhile — the slow job's publish
    must fail, not install an index inconsistent with the pinned
    docs."""
    docs, idx = two_tables
    cat = str(tmp_path / "cat")
    init_catalog(spark, cat)
    publish_latest(spark, cat, {"docs": docs, "index": idx})

    # fast publisher advances docs + catalog
    commit_append(spark, docs, _mk(spark, [(3, "d3")]))
    publish(spark, cat, {"docs": {"path": docs, "version": None}})

    # slow job still believes docs is at v1
    with pytest.raises(ConcurrentCommitError, match="compare-and-publish"):
        publish(
            spark, cat,
            {"index": {"path": idx, "version": 1}},
            expected={"docs": 1},
        )
    # matching expectation goes through
    publish(
        spark, cat,
        {"index": {"path": idx, "version": 1}},
        expected={"docs": 2},
    )


def test_concurrent_publish_one_winner(spark, tmp_path, two_tables):
    """Two publishers race for the same catalog version: the
    exclusive-create admits exactly one; the loser raises instead of
    silently clobbering (same guarantee as table commits, same
    primitive)."""
    from gedixr_spark.sinks.versioned import (
        CommitGuard, FsCommitGuard, set_commit_guard,
    )

    docs, idx = two_tables
    cat = str(tmp_path / "cat")
    init_catalog(spark, cat)

    class FirstOnly(CommitGuard):
        """Simulates the race: the second create of the SAME path
        (catalog entry 1) loses even though both saw version 0."""

        def __init__(self):
            self.inner = FsCommitGuard()

        def try_create(self, spark_, full_path, payload):
            return self.inner.try_create(spark_, full_path, payload)

    prev = set_commit_guard(FirstOnly())
    try:
        publish_latest(spark, cat, {"docs": docs})
        # second publisher computed against the same base version —
        # simulate by pre-creating its target entry name through the
        # winner above, then racing: the atomic create returns False
        import gedixr_spark.sinks.catalog as cmod

        real_list = cmod._list_log_versions

        def stale_list(spark_, path):
            vs = real_list(spark_, path)
            # the loser read the log BEFORE the winner's publish
            if path == cat and vs == [0, 1]:
                return [0]
            return vs

        cmod._list_log_versions = stale_list
        try:
            with pytest.raises(ConcurrentCommitError, match="concurrent"):
                publish_latest(spark, cat, {"index": idx})
        finally:
            cmod._list_log_versions = real_list
    finally:
        set_commit_guard(prev)
    hist = catalog_history(spark, cat)
    assert [e["version"] for e in hist] == [0, 1]
    assert set(read_pins(spark, cat)) == {"docs"}
