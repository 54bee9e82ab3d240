"""r11 VERDICT #7: quarantine is no longer a roach motel.

`readmit_quarantine` repairs quarantined rows, re-validates them under
the table's registered expectations, and lands them while RELEASING
the consumed sidecar files in one atomic log entry; released sidecars
leave `read_quarantine` immediately and `vacuum_versioned` ages them
out (unreleased ones stay protected).
"""

import pytest
from pyspark.sql import functions as F

import gedixr_spark.sinks.versioned as vt


@pytest.fixture()
def qtable(spark, tmp_path):
    path = str(tmp_path / "q")
    vt.init_versioned(spark, path)
    vt.commit_append(
        spark, path,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)],
            "id long, name string, balance double",
        ),
    )
    vt.set_table_expectations(
        spark, path,
        not_null=["name"],
        checks={"non_negative_balance": "balance >= 0"},
        on_violation="quarantine",
    )
    # 1 clean + 2 violating rows (NULL name; negative balance)
    vt.commit_append(
        spark, path,
        spark.createDataFrame(
            [(10, "p", 1.0), (11, None, 3.0), (12, "r", -4.0)],
            "id long, name string, balance double",
        ),
    )
    return path


def test_readmit_fixes_rows_and_releases_sidecars(spark, qtable):
    assert sorted(
        r["id"] for r in vt.read_quarantine(spark, qtable).collect()
    ) == [11, 12]

    def fix(df):
        return df.withColumn(
            "name", F.coalesce(F.col("name"), F.lit("unknown"))
        ).withColumn("balance", F.abs(F.col("balance")))

    res = vt.readmit_quarantine(spark, qtable, fix=fix)
    assert res["op"] == "readmit"
    assert res["meta"]["n_readmitted"] == 2
    assert res["quarantine_release"]
    # rows re-entered, repaired
    got = {
        r["id"]: (r["name"], r["balance"])
        for r in vt.read_versioned(spark, qtable).collect()
    }
    assert got[11] == ("unknown", 3.0)
    assert got[12] == ("r", 4.0)
    # quarantine emptied in the SAME commit
    assert vt.read_quarantine(spark, qtable).count() == 0
    assert vt.quarantine_files(spark, qtable) == []
    # pre-release version still shows the audit trail (time travel)
    assert sorted(
        r["id"]
        for r in vt.read_quarantine(
            spark, qtable, version=res["version"] - 1
        ).collect()
    ) == [11, 12]
    # the re-admitted rows surface as CDC inserts
    ch = vt.table_changes(spark, qtable, res["version"] - 1)
    assert sorted(
        (r["id"], r["_change_type"]) for r in ch.collect()
    ) == [(11, "insert"), (12, "insert")]


def test_vacuum_ages_out_released_sidecars_only(spark, qtable, tmp_path):
    import os

    qdir = qtable.rstrip("/") + "/quarantine"
    live_before = set(vt.quarantine_files(spark, qtable))
    assert live_before
    # vacuum BEFORE release: referenced sidecars are protected even at
    # zero retention
    vt.vacuum_versioned(spark, qtable, keep_last=1, retention_hours=0)
    assert set(os.listdir(qdir)) >= live_before

    def fix(df):
        return df.withColumn(
            "name", F.coalesce(F.col("name"), F.lit("x"))
        ).withColumn("balance", F.abs(F.col("balance")))

    vt.readmit_quarantine(spark, qtable, fix=fix)
    deleted = vt.vacuum_versioned(spark, qtable, keep_last=1, retention_hours=0)
    assert live_before <= set(deleted)
    left = set(os.listdir(qdir)) if os.path.isdir(qdir) else set()
    assert not (left & live_before)


def test_readmit_revalidates_against_expectations(spark, qtable):
    # identity fix leaves the violations in place — must raise, and
    # NOTHING must land
    n_before = vt.read_versioned(spark, qtable).count()
    with pytest.raises(ValueError):
        vt.readmit_quarantine(spark, qtable)
    assert vt.read_versioned(spark, qtable).count() == n_before
    assert vt.read_quarantine(spark, qtable).count() == 2


def test_readmit_rejects_row_count_changes(spark, qtable):
    def dropping_fix(df):
        return df.filter(F.col("name").isNotNull()).withColumn(
            "balance", F.abs(F.col("balance"))
        )

    with pytest.raises(ValueError, match="row count"):
        vt.readmit_quarantine(spark, qtable, fix=dropping_fix)


def test_readmit_empty_quarantine_raises(spark, tmp_path):
    path = str(tmp_path / "empty")
    vt.init_versioned(spark, path)
    vt.commit_append(
        spark, path, spark.createDataFrame([(1, "a")], "id long, name string")
    )
    with pytest.raises(ValueError, match="nothing is quarantined"):
        vt.readmit_quarantine(spark, path)


def test_release_survives_checkpoint_and_expiry(spark, qtable):
    def fix(df):
        return df.withColumn(
            "name", F.coalesce(F.col("name"), F.lit("x"))
        ).withColumn("balance", F.abs(F.col("balance")))

    vt.readmit_quarantine(spark, qtable, fix=fix)
    vt.checkpoint_log(spark, qtable)
    vt.expire_log(spark, qtable)
    assert vt.quarantine_files(spark, qtable) == []
    assert vt.read_quarantine(spark, qtable).count() == 0
    assert vt.read_versioned(spark, qtable).count() == 5
