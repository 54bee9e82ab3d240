"""Round-11 second wave: (a) optimistic-concurrency commit REBASE with
Delta-style logical conflict detection — a writer losing the version
race lands anyway when the interleaved commits provably don't conflict,
and fails loudly when they do; (b) CDC-fed incremental aggregates —
retraction-based view maintenance over `table_changes`, equal to a
from-scratch aggregate after any churn.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gedixr_spark.operators.incremental import (
    init_incremental_agg,
    read_incremental_agg_cdc,
    refresh_incremental_agg_cdc,
)
from gedixr_spark.sinks.versioned import (
    ConcurrentCommitError,
    commit_append,
    commit_compact,
    commit_delete,
    commit_merge,
    commit_upsert,
    init_versioned,
    read_versioned,
    rollback,
    table_history,
)


def _mk(spark, pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs])


def _rows(spark, path):
    return sorted(
        (r["k"], r["v"]) for r in read_versioned(spark, path).collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "rb")
    init_versioned(spark, path)
    commit_append(spark, path, _mk(spark, [(i, "a") for i in range(6)]).coalesce(1))
    return path


# --------------------------- rebase ------------------------------------


def test_upsert_rebases_over_disjoint_append(spark, table):
    """Writer A reads at v1; writer B lands an append with DISJOINT
    keys; A's pinned-base upsert must REBASE (not fail, not redo) and
    both writers' effects survive."""
    commit_append(spark, table, _mk(spark, [(100, "b"), (101, "b")]))  # B
    res = commit_upsert(
        spark, table, _mk(spark, [(1, "UPD")]), keys=["k"], base_version=1
    )  # A, race lost
    assert res["meta"]["n_rebases"] == 1
    assert res["meta"]["read_version"] == 1
    got = dict(_rows(spark, table))
    assert got[1] == "UPD" and got[100] == "b" and got[5] == "a"
    assert len(got) == 8


def test_upsert_conflicts_with_overlapping_append(spark, table):
    """B appended a row with A's key: A's match/replace decision is
    stale — the rebase probe must refuse."""
    commit_append(spark, table, _mk(spark, [(1, "b-wins")]))
    with pytest.raises(ConcurrentCommitError, match="concurrently-added"):
        commit_upsert(
            spark, table, _mk(spark, [(1, "a-stale")]), keys=["k"],
            base_version=1,
        )


def test_upsert_conflicts_when_its_file_was_rewritten(spark, table):
    """B upserted the same file A rewrites: A's kept-rows copy is
    stale — file-level conflict, no probe needed."""
    commit_upsert(spark, table, _mk(spark, [(2, "B")]), keys=["k"])
    with pytest.raises(ConcurrentCommitError, match="rewrites or delete-targets"):
        commit_upsert(
            spark, table, _mk(spark, [(1, "A")]), keys=["k"], base_version=1
        )
    # B's write is intact, A left nothing behind
    assert dict(_rows(spark, table))[2] == "B"


def test_delete_rebases_and_conflicts_by_predicate(spark, table):
    # disjoint interleaved append → rebase
    commit_append(spark, table, _mk(spark, [(50, "x")]))
    res = commit_delete(
        spark, table, F.col("k") == 3, base_version=1, mode="cow"
    )
    assert res["meta"]["n_rebases"] == 1
    assert 3 not in dict(_rows(spark, table)) and 50 in dict(_rows(spark, table))
    # interleaved append MATCHING the predicate → conflict (the
    # predicate must also match at base, else the delete no-ops before
    # any race — which is itself correct serialization, A before B)
    base = table_history(spark, table)[-1]["version"]
    commit_append(spark, table, _mk(spark, [(99, "y")]))
    with pytest.raises(ConcurrentCommitError, match="concurrently-added"):
        commit_delete(
            spark, table, F.col("k") % 2 == 1, base_version=base, mode="cow"
        )


def test_dv_delete_rebase_and_dv_dv_conflict(spark, table):
    # disjoint append → dv delete rebases; its DV still applies
    commit_append(spark, table, _mk(spark, [(70, "z")]))
    res = commit_delete(
        spark, table, F.col("k") == 2, base_version=1, mode="dv"
    )
    assert res["meta"]["n_rebases"] == 1
    assert 2 not in dict(_rows(spark, table))
    # two concurrent DV deletes targeting the SAME file: positions
    # could double-count — must conflict
    base = table_history(spark, table)[-1]["version"]
    commit_delete(spark, table, F.col("k") == 4, mode="dv")
    with pytest.raises(ConcurrentCommitError, match="rewrites or delete-targets"):
        commit_delete(
            spark, table, F.col("k") == 5, base_version=base, mode="dv"
        )


def test_merge_rebases_over_append_and_conflicts_with_compact(spark, table):
    commit_append(spark, table, _mk(spark, [(200, "m")]))
    res = commit_merge(
        spark, table, _mk(spark, [(0, "M"), (300, "I")]), keys=["k"],
        when_matched_update="all", base_version=1,
    )
    assert res["meta"]["n_rebases"] == 1
    got = dict(_rows(spark, table))
    assert got[0] == "M" and got[300] == "I" and got[200] == "m"
    # interleaved compaction rewrote the file this merge targets →
    # file-level conflict
    base = table_history(spark, table)[-1]["version"]
    commit_compact(spark, table, n_files=1)
    with pytest.raises(ConcurrentCommitError, match="rewrites or delete-targets"):
        commit_merge(
            spark, table, _mk(spark, [(0, "stale")]), keys=["k"],
            when_matched_update="all", base_version=base,
        )


def test_rollback_interleaved_always_conflicts(spark, table):
    commit_upsert(spark, table, _mk(spark, [(0, "u")]), keys=["k"])  # v2
    base = table_history(spark, table)[-1]["version"]
    rollback(spark, table, 1)  # v3
    with pytest.raises(ConcurrentCommitError, match="rollback"):
        commit_upsert(
            spark, table, _mk(spark, [(700, "n")]), keys=["k"],
            base_version=base,
        )


# ---------------------- CDC-fed incremental agg -------------------------


def _mkv(spark, rows):
    return spark.createDataFrame(
        [Row(g=g, doc_id=d, v=v) for g, d, v in rows],
        "g string, doc_id long, v long",
    )


def test_cdc_view_equals_scratch_after_any_churn(spark, tmp_path):
    """Retraction-based maintenance law: after every refresh, the
    CDC-maintained (count, sum, mean) per group equals a from-scratch
    aggregate over the source snapshot — across appends, upserts,
    both delete modes, and an op-coded merge."""
    src = str(tmp_path / "src")
    st = str(tmp_path / "state")
    init_versioned(spark, src)
    init_incremental_agg(spark, st)

    def check():
        refresh_incremental_agg_cdc(spark, src, st, keys=["g"], value_col="v")
        got = sorted(
            (r["g"], r["n_rows"], r["sum"])
            for r in read_incremental_agg_cdc(spark, st).collect()
        )
        want = sorted(
            (r["g"], r["n"], r["s"])
            for r in read_versioned(spark, src)
            .groupBy("g")
            .agg(
                F.count("v").alias("n"),
                F.sum(F.col("v").cast("double")).alias("s"),
            )
            .filter(F.col("n") > 0)
            .collect()
        )
        assert got == want

    commit_append(
        spark, src,
        _mkv(spark, [("a", i, i) for i in range(10)]
             + [("b", 10 + i, 2 * i) for i in range(5)]).repartition(2),
    )
    check()
    commit_upsert(
        spark, src, _mkv(spark, [("a", 1, 1000), ("c", 100, 7)]),
        keys=["doc_id"],
    )
    check()
    commit_delete(spark, src, F.col("g") == "b", mode="dv")
    check()
    commit_delete(spark, src, F.col("doc_id") % 3 == 0, mode="cow")
    check()
    commit_merge(
        spark, src,
        _mkv(spark, [("a", 1, 5), ("d", 500, 50)]),
        keys=["doc_id"], when_matched_update="all",
    )
    check()
    # fully-retracted groups left the view
    commit_delete(spark, src, F.col("g") == "c", mode="cow")
    check()
    assert "c" not in {
        r["g"] for r in read_incremental_agg_cdc(spark, st).collect()
    }
    # idempotent no-op refresh
    res = refresh_incremental_agg_cdc(spark, src, st, keys=["g"], value_col="v")
    assert res["n_keys"] is None
