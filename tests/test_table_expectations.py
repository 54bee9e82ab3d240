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
    # ONE combined pre-write collect (r13): batch facts + constraint
    # sums + touched-file discovery ride a single crossJoin of two
    # one-row aggregates; anything more means a gate grew its own action
    assert counts["n"] == 1, counts
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


# --- on_violation policies (r10 VERDICT #5) -----------------------------


def _mixed(spark):
    """2 clean rows, 1 NULL-name row, 1 negative-balance row."""
    return spark.createDataFrame(
        [(10, "p", 1.0), (11, "q", 2.0), (12, None, 3.0), (13, "r", -4.0)],
        "id long, name string, balance double",
    )


def _set_policy(spark, table, policy):
    return vt.set_table_expectations(
        spark,
        table,
        not_null=["name"],
        checks={"non_negative_balance": "balance >= 0"},
        on_violation=policy,
    )


def test_on_violation_rejects_unknown_policy(spark, table):
    with pytest.raises(ValueError, match="fail.drop.quarantine"):
        _set_policy(spark, table, "ignore")


def test_drop_policy_writes_passing_rows_and_records_counts(spark, table):
    _set_policy(spark, table, "drop")
    vt.commit_append(spark, table, _mixed(spark))
    ids = sorted(r["id"] for r in vt.read_versioned(spark, table).collect())
    assert ids == [1, 2, 3, 10, 11]  # violating 12/13 dropped
    e = vt.table_history(spark, table)[-1]
    exp = e["meta"]["expectations"]
    assert exp["policy"] == "drop" and exp["n_violations"] == 2
    assert exp["by_constraint"] == {
        "not_null:name": 1, "check:non_negative_balance": 1,
    }
    # a fully-clean batch still records the audit row (0 violations)
    vt.commit_append(
        spark, table,
        spark.createDataFrame(
            [(20, "s", 9.0)], "id long, name string, balance double"
        ),
    )
    e = vt.table_history(spark, table)[-1]
    assert e["meta"]["expectations"]["n_violations"] == 0


def test_quarantine_policy_routes_rows_atomically(spark, table):
    _set_policy(spark, table, "quarantine")
    vt.commit_append(spark, table, _mixed(spark))
    ids = sorted(r["id"] for r in vt.read_versioned(spark, table).collect())
    assert ids == [1, 2, 3, 10, 11]
    q = vt.read_quarantine(spark, table)
    assert sorted(r["id"] for r in q.collect()) == [12, 13]
    # one atomic commit carries both destinations
    e = vt.table_history(spark, table)[-1]
    assert e["op"] == "append" and e.get("quarantine_add")
    assert e["meta"]["expectations"]["n_violations"] == 2


def test_quarantine_across_upsert_and_merge(spark, table):
    _set_policy(spark, table, "quarantine")
    # upsert: a violating update row is quarantined, clean ones apply
    vt.commit_upsert(
        spark, table,
        spark.createDataFrame(
            [(1, "a", 100.0), (2, None, 5.0)],
            "id long, name string, balance double",
        ),
        keys=["id"],
    )
    got = {r["id"]: r["balance"] for r in vt.read_versioned(spark, table).collect()}
    assert got[1] == 100.0 and got[2] == 20.0  # id=2 untouched
    assert sorted(r["id"] for r in vt.read_quarantine(spark, table).collect()) == [2]
    # merge: rows the update EXPRESSION drives negative are quarantined
    # out of the merged result (pass-through rows stay)
    vt.commit_merge(
        spark, table,
        spark.createDataFrame([(3, 99.0)], "id long, amount double"),
        keys=["id"],
        when_matched_update={"balance": "t.balance - s.amount"},
        when_not_matched_insert=False,
    )
    got = sorted(r["id"] for r in vt.read_versioned(spark, table).collect())
    assert got == [1, 2]  # id=3's merged row went to quarantine
    assert sorted(
        r["id"] for r in vt.read_quarantine(spark, table).collect()
    ) == [2, 3]


def test_unique_contract_fails_even_under_drop(spark, table):
    _set_policy(spark, table, "drop")
    dup = spark.createDataFrame(
        [(30, "u", 1.0), (30, "u", 1.0)],
        "id long, name string, balance double",
    )
    with pytest.raises(ValueError, match="batch contract"):
        vt.commit_append(spark, table, dup, expect={"unique": ["id"]})


def test_quarantine_crash_atomicity_and_vacuum(spark, table):
    """A commit that writes its quarantine + data files but LOSES the
    log race leaves NO visible rows on either side; vacuum collects
    both orphan sets."""
    _set_policy(spark, table, "quarantine")

    class AlwaysLose(vt.CommitGuard):
        def try_create(self, spark, full_path, payload):
            return False

    prev = vt.set_commit_guard(AlwaysLose())
    try:
        with pytest.raises(vt.ConcurrentCommitError):
            vt.commit_append(spark, table, _mixed(spark), max_retries=0)
    finally:
        vt.set_commit_guard(prev)
    # nothing visible: no version bump, quarantine empty
    assert vt.read_versioned(spark, table).count() == 3
    assert vt.read_quarantine(spark, table).count() == 0
    # the crashed commit's data AND quarantine files are collected
    gone = vt.vacuum_versioned(spark, table, keep_last=1, retention_hours=0)
    assert gone
    assert vt.read_versioned(spark, table).count() == 3
    assert vt.read_quarantine(spark, table).count() == 0


def test_quarantine_survives_checkpoint_expiry_and_rollback(spark, table):
    _set_policy(spark, table, "quarantine")
    vt.commit_append(spark, table, _mixed(spark))
    v_after = vt.table_history(spark, table)[-1]["version"]
    vt.checkpoint_log(spark, table)
    vt.expire_log(spark, table)
    assert sorted(
        r["id"] for r in vt.read_quarantine(spark, table).collect()
    ) == [12, 13]
    # rollback restores DATA, not the audit trail: quarantine persists
    vt.commit_append(
        spark, table,
        spark.createDataFrame(
            [(40, "w", 1.0)], "id long, name string, balance double"
        ),
    )
    vt.rollback(spark, table, v_after)
    assert sorted(
        r["id"] for r in vt.read_quarantine(spark, table).collect()
    ) == [12, 13]


def test_validate_existing_data_at_registration(spark, table):
    """ADVICE r10: registration scans the live table (one aggregate,
    Delta ADD CONSTRAINT semantics) so a table with pre-existing
    violations can't silently accept appends but fail later merges."""
    vt.commit_append(
        spark, table,
        spark.createDataFrame(
            [(60, None, 1.0)], "id long, name string, balance double"
        ),
    )
    with pytest.raises(ValueError, match="existing data"):
        _set(spark, table)
    # explicit opt-out registers anyway
    vt.set_table_expectations(
        spark, table, not_null=["name"], validate_existing=False
    )
    assert vt.table_expectations(spark, table)["not_null"] == ["name"]


def test_append_collision_with_constraint_change_raises(spark, table):
    """r11 review finding: append's version-collision retry must NOT
    blindly re-commit past an interleaved set_table_expectations — the
    batch was validated against the OLD constraints. The race now
    raises for a re-read like every other writer."""
    bad = spark.createDataFrame(
        [(9, None, 1.0)], "id long, name string, balance double"
    )

    class InterleaveOnce(vt.CommitGuard):
        """Fail the victim's first commit attempt, landing a
        constraint change at that version instead."""

        def __init__(self, inner):
            self.inner, self.done = inner, False

        def try_create(self, spark_, full_path, payload):
            if not self.done:
                self.done = True
                vt.set_table_expectations(
                    spark, table, not_null=["name"]
                )
                return False
            return self.inner.try_create(spark_, full_path, payload)

    prev = vt.set_commit_guard(InterleaveOnce(vt.FsCommitGuard()))
    try:
        with pytest.raises(
            vt.ConcurrentCommitError, match="constraint/schema-mapping"
        ):
            vt.commit_append(spark, table, bad)
    finally:
        vt.set_commit_guard(prev)
    # the constraint landed; the pre-screened NULL-name rows did NOT
    assert vt.table_expectations(spark, table)["not_null"] == ["name"]
    assert vt.read_versioned(spark, table).count() == 3
    # and a plain version collision (data commit interleaved) still
    # retries transparently — appends stay effectively conflict-free
    ok = spark.createDataFrame(
        [(9, "x", 1.0)], "id long, name string, balance double"
    )

    class LoseOnceToAppend(vt.CommitGuard):
        def __init__(self, inner):
            self.inner, self.done = inner, False

        def try_create(self, spark_, full_path, payload):
            if not self.done:
                self.done = True
                vt.commit_append(
                    spark, table,
                    spark.createDataFrame(
                        [(50, "y", 2.0)], "id long, name string, balance double"
                    ),
                )
                return False
            return self.inner.try_create(spark_, full_path, payload)

    prev = vt.set_commit_guard(LoseOnceToAppend(vt.FsCommitGuard()))
    try:
        res = vt.commit_append(spark, table, ok)
    finally:
        vt.set_commit_guard(prev)
    assert res["meta"]["n_rebases"] == 1
    assert vt.read_versioned(spark, table).count() == 5
