"""r13 VERDICT #1 regressions: commit_upsert on additively-evolved,
never-mapped tables.

The bug: the kept-side rewrite scanned ONLY the touched files with
parquet mergeSchema, which cannot surface a column no scanned file
has — a touched slice that entirely predates an append-evolution came
back narrow and ``kept.unionByName(updates)`` threw
NUM_COLUMNS_MISMATCH. Fix: the target schema now comes from the LOG's
latest schema (covering metadata-only add_column too, where NO file
carries the column yet) and the touched slice is projected with typed
NULLs for missing fields — the same projection commit_merge always
applied (versioned.py).

Reference parity note: the reference engine has no versioned tables;
this is extension-layer (Delta/Iceberg-shaped) surface.
"""

from __future__ import annotations

import pytest


def _vt():
    from gedixr_spark.sinks import versioned as vt
    return vt


def test_upsert_after_append_evolution_touching_old_file(spark, tmp_path):
    """append narrow → append wide → upsert a key living in the OLD
    (narrow) file: must commit and read back the full wide row."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(
        spark, t, spark.createDataFrame([(0, "a"), (1, "b")], "k long, v0 string")
    )
    vt.commit_append(
        spark, t,
        spark.createDataFrame([(2, "c", "x2")], "k long, v0 string, c1 string"),
    )
    vt.commit_upsert(
        spark, t,
        spark.createDataFrame([(0, "a0", "x0")], "k long, v0 string, c1 string"),
        keys=["k"],
    )
    rows = {r["k"]: (r["v0"], r["c1"])
            for r in vt.read_versioned(spark, t).collect()}
    assert rows == {0: ("a0", "x0"), 1: ("b", None), 2: ("c", "x2")}


def test_upsert_after_metadata_only_add_column(spark, tmp_path):
    """add_column with NO subsequent wide data file: the batch must
    carry the new column (upsert is full-row replace) and it must LAND
    — the old scan-derived column set would have silently dropped it."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(
        spark, t, spark.createDataFrame([(0, "a"), (1, "b")], "k long, v0 string")
    )
    vt.add_column(spark, t, "c1", "string")
    vt.commit_upsert(
        spark, t,
        spark.createDataFrame([(0, "a0", "x0")], "k long, v0 string, c1 string"),
        keys=["k"],
    )
    rows = {r["k"]: (r["v0"], r["c1"])
            for r in vt.read_versioned(spark, t).collect()}
    assert rows == {0: ("a0", "x0"), 1: ("b", None)}


def test_upsert_missing_log_schema_column_rejects(spark, tmp_path):
    """A batch missing a metadata-added column is rejected loudly
    (full-row-replace contract), not silently narrowed."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(
        spark, t, spark.createDataFrame([(0, "a")], "k long, v0 string")
    )
    vt.add_column(spark, t, "c1", "string")
    with pytest.raises(ValueError, match="missing target columns"):
        vt.commit_upsert(
            spark, t,
            spark.createDataFrame([(0, "a0")], "k long, v0 string"),
            keys=["k"],
        )


def test_upsert_evolution_then_cdc_and_time_travel(spark, tmp_path):
    """The fixed rewrite keeps the rest of the machinery honest:
    table_changes across the evolved upsert yields a keyed
    update_pre/update_post pair with the NULL-backfilled column, and
    the pre-upsert snapshot still reads narrow-file rows intact."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(
        spark, t, spark.createDataFrame([(0, "a"), (1, "b")], "k long, v0 string")
    )  # v1
    vt.commit_append(
        spark, t,
        spark.createDataFrame([(2, "c", "x2")], "k long, v0 string, c1 string"),
    )  # v2
    vt.commit_upsert(
        spark, t,
        spark.createDataFrame([(0, "a0", "x0")], "k long, v0 string, c1 string"),
        keys=["k"],
    )  # v3
    # pre-upsert snapshot unchanged
    old = {r["k"]: r["v0"]
           for r in vt.read_versioned(spark, t, version=1).collect()}
    assert old == {0: "a", 1: "b"}
    ch = vt.table_changes(spark, t, 2, 3).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert {r["k"] for r in by_type.get("update_postimage", [])} == {0}
    post = by_type["update_postimage"][0]
    assert (post["v0"], post["c1"]) == ("a0", "x0")
    pre = by_type["update_preimage"][0]
    assert (pre["k"], pre["v0"], pre["c1"]) == (0, "a", None)


def test_delete_and_compact_on_append_evolved_table(spark, tmp_path):
    """Audit companions (r13 VERDICT #1 'Done ='): cow delete and
    compact rewrite evolved tables through ONE mergeSchema scan, so
    they never union mismatched widths — pin that they stay correct
    when the touched/compacted slice straddles the evolution."""
    from pyspark.sql import functions as F
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(
        spark, t, spark.createDataFrame([(0, "a"), (1, "b")], "k long, v0 string")
    )
    vt.commit_append(
        spark, t,
        spark.createDataFrame([(2, "c", "x2")], "k long, v0 string, c1 string"),
    )
    vt.commit_delete(spark, t, F.col("k") == 1, mode="cow")
    rows = {r["k"]: (r["v0"], r["c1"])
            for r in vt.read_versioned(spark, t).collect()}
    assert rows == {0: ("a", None), 2: ("c", "x2")}
    entry = vt.commit_compact(spark, t, n_files=1)
    assert entry["op"] == "compact"
    rows = {r["k"]: (r["v0"], r["c1"])
            for r in vt.read_versioned(spark, t).collect()}
    assert rows == {0: ("a", None), 2: ("c", "x2")}
