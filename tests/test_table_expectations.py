"""Table-level persisted expectations (sinks/versioned.py::
set_table_expectations — the Delta ALTER TABLE ADD CONSTRAINT shape):
registered once in the commit log, enforced on EVERY writer (append /
overwrite / upsert / merge) before any file lands, replayed through
time travel, checkpoints, and log expiry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gedixr_spark.sinks import versioned as vt


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "exp_tab")
    vt.init_versioned(spark, path)
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, balance double",
    )
    vt.commit_append(spark, path, df)
    return path


def _set(spark, table):
    return vt.set_table_expectations(
        spark,
        table,
        not_null=["name"],
        checks={"non_negative_balance": "balance >= 0"},
    )


def test_registration_validates_and_replays(spark, table):
    with pytest.raises(ValueError, match="not in table schema"):
        vt.set_table_expectations(spark, table, not_null=["nope"])
    with pytest.raises(Exception):  # unresolvable column in the expr
        vt.set_table_expectations(
            spark, table, checks={"bad": "ghost_col > 0"}
        )
    with pytest.raises(ValueError, match="identifier"):
        vt.set_table_expectations(
            spark, table, checks={"bad name!": "balance >= 0"}
        )
    e = _set(spark, table)
    assert e["op"] == "set_expectations"
    exp = vt.table_expectations(spark, table)
    assert exp["not_null"] == ["name"]
    assert exp["checks"] == {"non_negative_balance": "balance >= 0"}
    # time travel: before the registration commit there were none
    assert vt.table_expectations(spark, table, version=e["version"] - 1) == {}


def test_append_and_overwrite_gate_on_table_constraints(spark, table):
    _set(spark, table)
    bad_null = spark.createDataFrame(
        [(9, None, 1.0)], "id long, name string, balance double"
    )
    v_before = vt.table_history(spark, table)[-1]["version"]
    with pytest.raises(ValueError, match="name has 1 NULLs"):
        vt.commit_append(spark, table, bad_null)
    bad_check = spark.createDataFrame(
        [(9, "x", -5.0)], "id long, name string, balance double"
    )
    with pytest.raises(ValueError, match="non_negative_balance"):
        vt.commit_append(spark, table, bad_check)
    with pytest.raises(ValueError, match="non_negative_balance"):
        vt.commit_overwrite(spark, table, bad_check)
    # a rejected batch bumps no version and leaves no orphan rows
    assert vt.table_history(spark, table)[-1]["version"] == v_before
    assert vt.read_versioned(spark, table).count() == 3
    # a clean batch commits, and per-call expect still composes
    ok = spark.createDataFrame(
        [(9, "x", 5.0)], "id long, name string, balance double"
    )
    vt.commit_append(spark, table, ok, expect={"unique": ["id"]})
    assert vt.read_versioned(spark, table).count() == 4


def test_upsert_gates_without_extra_action(spark, table, monkeypatch):
    _set(spark, table)
    bad = spark.createDataFrame(
        [(2, "b2", -1.0)], "id long, name string, balance double"
    )
    with pytest.raises(ValueError, match="non_negative_balance"):
        vt.commit_upsert(spark, table, bad, keys=["id"])
    # the constraint rides the existing contract aggregate: an upsert
    # on a constrained table still runs ONE batch-fact collect
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pyspark 3.x
        from pyspark.sql import DataFrame
    counts = {"n": 0}
    real_collect = DataFrame.collect

    def counting(self):
        counts["n"] += 1
        return real_collect(self)

    ok = spark.createDataFrame(
        [(2, "b2", 99.0)], "id long, name string, balance double"
    )
    monkeypatch.setattr(DataFrame, "collect", counting)
    vt.commit_upsert(spark, table, ok, keys=["id"])
    monkeypatch.undo()
    # collects: batch facts (1) + touched-file discovery (1); anything
    # more means the constraint gained its own action
    assert counts["n"] == 2, counts
    got = {
        r["id"]: r["balance"] for r in vt.read_versioned(spark, table).collect()
    }
    assert got[2] == 99.0


def test_merge_gates_the_merged_result_not_just_the_batch(spark, table):
    """The merge case that motivates result-side enforcement: the
    BATCH is clean but the update EXPRESSION drives a column negative
    — the constraint must still reject the commit."""
    _set(spark, table)
    debit = spark.createDataFrame(
        [(1, 25.0)], "id long, amount double"
    )
    with pytest.raises(ValueError, match="non_negative_balance"):
        vt.commit_merge(
            spark,
            table,
            debit,
            keys=["id"],
            when_matched_update={"balance": "t.balance - s.amount"},
            when_not_matched_insert=False,
        )
    # balance 10 - 25 < 0 rejected; 10 - 5 passes
    ok = spark.createDataFrame([(1, 5.0)], "id long, amount double")
    vt.commit_merge(
        spark,
        table,
        ok,
        keys=["id"],
        when_matched_update={"balance": "t.balance - s.amount"},
        when_not_matched_insert=False,
    )
    got = {
        r["id"]: r["balance"] for r in vt.read_versioned(spark, table).collect()
    }
    assert got[1] == 5.0


def test_clear_and_null_check_semantics(spark, table):
    _set(spark, table)
    # NULL check result is a violation (a constraint that cannot be
    # evaluated is not satisfied) — Delta semantics
    null_balance = spark.createDataFrame(
        [(7, "g", None)], "id long, name string, balance double"
    )
    with pytest.raises(ValueError, match="non_negative_balance"):
        vt.commit_append(spark, table, null_balance)
    # clearing: same batch commits afterwards
    vt.set_table_expectations(spark, table)
    assert vt.table_expectations(spark, table) == {}
    vt.commit_append(spark, table, null_balance)
    assert vt.read_versioned(spark, table).count() == 4


def test_expectations_survive_checkpoint_and_log_expiry(spark, table):
    _set(spark, table)
    vt.commit_append(
        spark,
        table,
        spark.createDataFrame(
            [(8, "h", 1.0)], "id long, name string, balance double"
        ),
    )
    vt.checkpoint_log(spark, table)
    expired = vt.expire_log(spark, table)
    assert expired  # the set_expectations entry is gone from the log
    exp = vt.table_expectations(spark, table)
    assert exp["checks"] == {"non_negative_balance": "balance >= 0"}
    # and still ENFORCED post-expiry
    with pytest.raises(ValueError, match="non_negative_balance"):
        vt.commit_append(
            spark,
            table,
            spark.createDataFrame(
                [(9, "i", -1.0)], "id long, name string, balance double"
            ),
        )


def test_clone_carries_expectations_and_rollback_keeps_them(spark, table, tmp_path):
    """A shallow clone of a curated table stays curated (the source's
    constraints ride the clone commit, independently clearable); a
    data rollback does NOT roll back constraints (rollback restores
    the live set, not the table's contract)."""
    _set(spark, table)
    dst = str(tmp_path / "exp_clone")
    vt.shallow_clone(spark, table, dst)
    assert vt.table_expectations(spark, dst)["checks"] == {
        "non_negative_balance": "balance >= 0"
    }
    with pytest.raises(ValueError, match="non_negative_balance"):
        vt.commit_append(
            spark,
            dst,
            spark.createDataFrame(
                [(99, "z", -1.0)], "id long, name string, balance double"
            ),
        )
    # clone clears independently; source unaffected
    vt.set_table_expectations(spark, dst)
    assert vt.table_expectations(spark, dst) == {}
    assert vt.table_expectations(spark, table) != {}

    # rollback on the source: constraints persist across it
    v_set = vt.table_history(spark, table)[-1]["version"]
    vt.commit_append(
        spark,
        table,
        spark.createDataFrame(
            [(50, "ok", 1.0)], "id long, name string, balance double"
        ),
    )
    vt.rollback(spark, table, v_set)
    assert vt.table_expectations(spark, table)["not_null"] == ["name"]
