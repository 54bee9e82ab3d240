"""Z-order clustering (operators/zorder.py): Morton-key differential
vs a python twin, quantile-bucket laws, pruning effectiveness through
the versioned table's multi-column file skipping, plan hygiene.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import zorder as zo
from gedixr_spark.sinks import versioned as vt


@pytest.fixture(scope="module")
def xy(spark):
    rng = np.random.default_rng(7)
    # two independent skewed columns — exponential x exercises the
    # quantile (equal-mass) bucketing where equal-width would collapse
    x = rng.exponential(scale=10.0, size=4000)
    y = rng.uniform(0.0, 100.0, size=4000)
    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))]
    return spark.createDataFrame(rows, "id long, x double, y double").localCheckpoint()


def _py_bucket(vals: np.ndarray, bounds: list[float]) -> np.ndarray:
    return np.searchsorted(np.asarray(bounds), vals, side="right")


def _py_interleave(bx: np.ndarray, by: np.ndarray, bits: int) -> np.ndarray:
    z = np.zeros_like(bx)
    for k in range(bits):
        z |= ((bx >> k) & 1) << (k * 2 + 1)  # col 0 = more significant
        z |= ((by >> k) & 1) << (k * 2)
    return z


def test_zorder_key_matches_python(spark, xy):
    params = zo.fit_zorder(xy, ["x", "y"], bits=4)
    got = (
        xy.select("id", zo.zorder_key(params).alias("z"))
        .orderBy("id")
        .toPandas()
    )
    pdf = xy.orderBy("id").toPandas()
    bx = _py_bucket(pdf["x"].to_numpy(), params["bounds"]["x"])
    by = _py_bucket(pdf["y"].to_numpy(), params["bounds"]["y"])
    want = _py_interleave(bx.astype(np.int64), by.astype(np.int64), 4)
    assert (got["z"].to_numpy() == want).all()
    assert got["z"].max() < (1 << 8) and got["z"].min() >= 0


def test_quantile_buckets_are_balanced(spark, xy):
    """Equal-mass property: with bits=3 every bucket of the skewed
    exponential column holds ~1/8 of the rows (approx quantiles →
    loose tolerance)."""
    params = zo.fit_zorder(xy, ["x", "y"], bits=3)
    counts = (
        xy.select(zo._bucket("x", params).alias("b"))
        .groupBy("b")
        .count()
        .toPandas()
        .set_index("b")["count"]
    )
    assert len(counts) == 8
    assert counts.min() > 4000 / 8 * 0.6 and counts.max() < 4000 / 8 * 1.6


def test_guards(spark, xy):
    with pytest.raises(ValueError):
        zo.fit_zorder(xy, ["x"], bits=4)
    with pytest.raises(ValueError):
        zo.fit_zorder(xy, ["x", "y"], bits=40)
    with pytest.raises(ValueError):
        zo.fit_zorder(xy.limit(0), ["x", "y"], bits=2)
    with pytest.raises(ValueError):
        zo.cluster_by_zorder(xy, zo.fit_zorder(xy, ["x", "y"], bits=2), 0)


def test_nulls_land_in_bucket_zero(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3.0, None)], "id long, x double, y double"
    )
    # hand-built quantile boundaries: buckets split at 2.5/5.0/7.5
    params = {
        "bits": 2,
        "cols": ["x", "y"],
        "bounds": {"x": [2.5, 5.0, 7.5], "y": [2.5, 5.0, 7.5]},
    }
    rows = df.select("id", zo.zorder_key(params).alias("z")).orderBy("id").collect()
    # NULL x -> x-bits all zero; y=5.0 -> 2 boundaries <= it -> bucket 2
    assert rows[0]["z"] == zo_interleave_single(0, 2)
    # x=3.0 -> bucket 1; NULL y -> bucket 0
    assert rows[1]["z"] == zo_interleave_single(1, 0)


def zo_interleave_single(bx: int, by: int) -> int:
    z = 0
    for k in range(2):
        z |= ((bx >> k) & 1) << (k * 2 + 1)
        z |= ((by >> k) & 1) << (k * 2)
    return z


def test_clustered_write_prunes_multiplicatively(spark, xy):
    """The point of the operator: a z-clustered table prunes a 2-D box
    predicate down to a small fraction of files, while the same data
    sorted on x alone keeps pruning on x but reads ~everything for a
    y-only predicate."""
    root = tempfile.mkdtemp(prefix="zorder_test_")
    zpath, xpath = root + "/ztab", root + "/xtab"
    try:
        vt.init_versioned(spark, zpath)
        vt.init_versioned(spark, xpath)
        params = zo.fit_zorder(xy, ["x", "y"], bits=5)
        zo.append_clustered(spark, zpath, xy, ["x", "y"], params=params, n_files=16)
        vt.commit_append(
            spark,
            xpath,
            xy.repartitionByRange(16, F.col("x")).sortWithinPartitions("x"),
            stats_cols=["x", "y"],
        )
        # a ~1/5 x ~1/5 box in the bulk of both distributions
        box = {"x": (2.0, 6.0), "y": (20.0, 40.0)}
        zkeep, ztot = vt.files_for_ranges(spark, zpath, box)
        xkeep, xtot = vt.files_for_ranges(spark, xpath, box)
        assert ztot == 16 and xtot == 16
        # z-clustered: both dimensions cut the survivor set
        assert len(zkeep) <= 8
        # identical results either way (pruning is I/O-only)
        za = sorted(r["id"] for r in vt.read_where_all(spark, zpath, box).collect())
        xa = sorted(r["id"] for r in vt.read_where_all(spark, xpath, box).collect())
        brute = sorted(
            r["id"]
            for r in xy.filter(
                (F.col("x") >= 2.0) & (F.col("x") <= 6.0)
                & (F.col("y") >= 20.0) & (F.col("y") <= 40.0)
            ).collect()
        )
        assert za == brute and xa == brute
        # y-only predicate: the x-sorted table reads ~all files, the
        # z-table skips most of them
        ybox = {"y": (20.0, 30.0)}
        zy, _ = vt.files_for_ranges(spark, zpath, ybox)
        xny, _ = vt.files_for_ranges(spark, xpath, ybox)
        assert len(xny) >= 14  # x-sort gives y no locality
        assert len(zy) <= len(xny) - 4
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_compact_quantile_zorder_recovers_pruning(spark, xy):
    """OPTIMIZE ZORDER BY: a table built from unclustered appends
    prunes nothing; `commit_compact(zorder_by=..., zorder_mode=
    'quantile')` rewrites the small files along the equal-mass curve
    and the same box predicate starts skipping — with identical
    results before and after (time travel checks the pre-compaction
    snapshot)."""
    root = tempfile.mkdtemp(prefix="zorder_compact_")
    path = root + "/tab"
    try:
        vt.init_versioned(spark, path)
        for i in range(4):
            vt.commit_append(
                spark,
                path,
                xy.filter(F.col("id") % 4 == i).repartition(4),
                stats_cols=["x", "y"],
            )
        box = {"x": (2.0, 6.0), "y": (20.0, 40.0)}
        before_keep, before_tot = vt.files_for_ranges(spark, path, box)
        before_rows = sorted(
            r["id"] for r in vt.read_where_all(spark, path, box).collect()
        )
        entry = vt.commit_compact(
            spark,
            path,
            zorder_by=["x", "y"],
            zorder_mode="quantile",
            n_files=16,
            stats_cols=["x", "y"],
        )
        assert entry["op"] == "compact"
        after_keep, after_tot = vt.files_for_ranges(spark, path, box)
        assert len(before_keep) == before_tot  # random layout: no skipping
        assert len(after_keep) <= after_tot // 2
        after_rows = sorted(
            r["id"] for r in vt.read_where_all(spark, path, box).collect()
        )
        assert after_rows == before_rows
        # pre-compaction snapshot still reads byte-identically
        old = sorted(
            r["id"]
            for r in vt.read_where_all(
                spark, path, box, version=entry["version"] - 1
            ).collect()
        )
        assert old == before_rows
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_zorder_key_plan_is_python_free(spark, xy):
    params = zo.fit_zorder(xy, ["x", "y"], bits=6)
    plan = (
        xy.select(zo.zorder_key(params).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # executedPlan().toString() marks whole-stage codegen spans as *(n)
    assert "*(" in plan
