"""Parquet checkpoint manifests (r13 VERDICT #3 — metadata at scale):
the same lifecycle run on twin tables, one checkpointed as the classic
single JSON and one as light-JSON + parquet manifest, must be
indistinguishable to every reader — snapshot reads, time travel,
stats/bloom pruning, schema evolution (colmap + widen), expectations,
quarantine, the stream ledger, and post-expiry reads. Plus the
manifest-specific surfaces: the vectorized files_for_range fast path
(equivalent to the dict path by construction) and manifest_df.

Extension-layer surface (the reference engine has no versioned
tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vt():
    from gedixr_spark.sinks import versioned as vt
    return vt


def _mk(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _lifecycle(spark, vt, t):
    """A lifecycle touching every checkpoint field: appends with
    stats+blooms, upsert, DV delete, rename (colmap), widen, add with
    default, expectations, a quarantined batch, a stream batch."""
    vt.init_versioned(spark, t)
    for i in range(3):
        vt.commit_append(
            spark, t,
            _mk(spark, [(i * 10 + j, f"v{i}{j}") for j in range(4)]).coalesce(1),
            stats_cols=["k", "v"], bloom_cols=["k"],
        )
    vt.commit_upsert(spark, t, _mk(spark, [(11, "up")]), keys=["k"],
                     stats_cols=["k"])
    vt.commit_delete(spark, t, F.col("k") == 21, mode="dv")
    vt.rename_column(spark, t, "v", "val")
    vt.add_column(spark, t, "d", "string", default="dflt")
    vt.commit_append(
        spark, t,
        _mk(spark, [(90, "n", "x")], "k long, val string, d string"),
        stats_cols=["k"],
    )
    vt.set_table_expectations(spark, t, not_null=["k"])
    vt.commit_append(
        spark, t,
        _mk(spark, [(95, "s", "y")], "k long, val string, d string"),
        meta={"stream_batch_id": "b-1"},
    )
    return vt.table_history(spark, t)[-1]["version"]


def _snapshot(spark, vt, t, version=None):
    df = vt.read_versioned(spark, t, version=version)
    return sorted(
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    ), sorted(df.columns)


def test_twin_tables_agree_on_everything(spark, tmp_path):
    vt = _vt()
    tj, tp = str(tmp_path / "json"), str(tmp_path / "parq")
    cap_j = _lifecycle(spark, vt, tj)
    cap_p = _lifecycle(spark, vt, tp)
    assert cap_j == cap_p
    rj = vt.checkpoint_log(spark, tj, format="json")
    rp = vt.checkpoint_log(spark, tp, format="parquet")
    assert rj["format"] == "json" and rp["format"] == "parquet"

    # one more post-checkpoint commit on each (the Δ path)
    for t in (tj, tp):
        vt.commit_append(
            spark, t,
            _mk(spark, [(99, "z", "w")], "k long, val string, d string"),
            stats_cols=["k"],
        )

    vt.reset_metadata_cache()
    for version in (None, 3, 5, cap_j):
        assert _snapshot(spark, vt, tj, version) == \
            _snapshot(spark, vt, tp, version), version
    assert vt.file_range_stats(spark, tj) == vt.file_range_stats(spark, tp) \
        or len(vt.file_range_stats(spark, tj)) == len(vt.file_range_stats(spark, tp))
    assert vt.table_expectations(spark, tj) == vt.table_expectations(spark, tp)
    assert vt.seen_stream_batch_ids(spark, tj) == vt.seen_stream_batch_ids(spark, tp)
    sj = vt._latest_schema(spark, tj, None)
    sp = vt._latest_schema(spark, tp, None)
    assert sj == sp

    # expire both: post-expiry cold reads must still agree (the
    # checkpoint is now the only source of pre-cutoff state)
    vt.expire_log(spark, tj)
    vt.expire_log(spark, tp)
    vt.reset_metadata_cache()
    assert _snapshot(spark, vt, tj) == _snapshot(spark, vt, tp)
    # colmap state survived in both shapes: rename readable, default
    # surfaced on pre-add rows
    rows, cols = _snapshot(spark, vt, tp)
    assert "val" in cols and "d" in cols
    df = vt.read_versioned(spark, tp)
    assert df.filter(F.col("k") == 0).collect()[0]["d"] == "dflt"
    # the DV delete held through the parquet checkpoint
    assert df.filter(F.col("k") == 21).count() == 0


def test_range_prune_fast_path_equals_dict_path(spark, tmp_path):
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    # int-stats files, a string-stats column, an all-null file, and a
    # no-stats file
    for i in range(5):
        vt.commit_append(
            spark, t,
            _mk(spark, [(i * 10 + j, f"s{i}{j}") for j in range(3)]).coalesce(1),
            stats_cols=["k", "v"], bloom_cols=["k"],
        )
    vt.commit_append(
        spark, t,
        spark.createDataFrame([(None, None)], "k long, v string").coalesce(1),
        stats_cols=["k", "v"],
    )
    vt.commit_append(spark, t, _mk(spark, [(70, "nostats")]).coalesce(1))
    vt.checkpoint_log(spark, t, format="parquet")
    vt.commit_append(
        spark, t, _mk(spark, [(80, "post")]).coalesce(1), stats_cols=["k"]
    )

    vt.reset_metadata_cache()
    stats = vt.file_range_stats(spark, t)
    cases = [
        ("k", 10, 25), ("k", None, 5), ("k", 75, None), ("k", None, None),
        ("k", 1000, 2000), ("k", 10.5, 20.5), ("v", "s10", "s22"),
        ("v", None, "s0z"),
    ]
    for col, lo, hi in cases:
        fast, tot1 = vt.files_for_range(spark, t, col, lo, hi)
        slow, tot2 = vt.files_for_range(spark, t, col, lo, hi, stats=stats)
        assert (fast, tot1) == (slow, tot2), (col, lo, hi, fast, slow)
    # results, not just file sets: a pruned read returns exact rows
    got = sorted(r["k"] for r in vt.read_where(spark, t, "k", 10, 25).collect())
    assert got == [10, 11, 12, 20, 21, 22]


def test_auto_format_flips_at_threshold(spark, tmp_path, monkeypatch):
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(3):
        vt.commit_append(spark, t, _mk(spark, [(i, f"v{i}")]).coalesce(1))
    assert vt.checkpoint_log(spark, t)["format"] == "json"
    monkeypatch.setattr(vt, "_CK_MANIFEST_MIN_FILES", 2)
    assert vt.checkpoint_log(spark, t)["format"] == "parquet"
    vt.reset_metadata_cache()
    assert len(vt.read_versioned(spark, t).collect()) == 3


def test_manifest_df_is_the_planning_surface(spark, tmp_path):
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(4):
        vt.commit_append(
            spark, t, _mk(spark, [(i * 10, f"v{i}")]).coalesce(1),
            stats_cols=["k"],
        )
    with pytest.raises(ValueError, match="no parquet-manifest"):
        vt.manifest_df(spark, t)
    vt.checkpoint_log(spark, t, format="parquet")
    mdf = vt.manifest_df(spark, t)
    assert mdf.count() == 4
    # distributed file-skipping: the same survivor set the driver-side
    # pruner computes, expressed as a Spark filter over the manifest
    surv = {
        r["file"]
        for r in mdf.filter(
            (F.col("`max::k`") >= 15) & (F.col("`min::k`") <= 25)
        ).collect()
    }
    keep, _ = vt.files_for_range(spark, t, "k", 15, 25)
    assert surv == set(keep)


def test_lazy_checkpoint_reads_only_touched_columns(spark, tmp_path):
    """The laziness contract: a snapshot read through a parquet
    checkpoint must not load the stats/bloom fields at all."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(3):
        vt.commit_append(
            spark, t, _mk(spark, [(i, f"v{i}")]).coalesce(1),
            stats_cols=["k"], bloom_cols=["k"],
        )
    vt.checkpoint_log(spark, t, format="parquet")
    vt.reset_metadata_cache()
    vt.read_versioned(spark, t).collect()
    kp = vt._cache_key_path(t)
    loaded = {k[2] for k in vt._MANIFEST_CACHE if k[0] == kp}
    assert "live" in loaded
    assert "stats" not in loaded and "blooms" not in loaded, loaded


def test_clustered_layout_prunes_like_a_partition_spec(spark, tmp_path):
    """SCALE §15's measured position: stats-pruning over a range-
    clustered layout delivers the partition-pruning effect (few files
    read), a hash-random layout reads everything — identical results
    both ways. The write-side clustering knob IS the partition spec."""
    vt = _vt()
    li = spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    lo, hi = 3600, 4000  # ~5%

    def build(name, df):
        t = str(tmp_path / name)
        vt.init_versioned(spark, t)
        vt.commit_append(spark, t, df, stats_cols=["k"])
        vt.checkpoint_log(spark, t, format="parquet")
        return t

    ta = build("rand", li.repartition(16))
    tb = build(
        "clust", li.repartitionByRange(16, "k").sortWithinPartitions("k")
    )
    keep_a, tot_a = vt.files_for_range(spark, ta, "k", lo, hi)
    keep_b, tot_b = vt.files_for_range(spark, tb, "k", lo, hi)
    assert tot_a == tot_b == 16
    assert len(keep_a) == 16          # random: stats can prove nothing
    assert len(keep_b) <= 3, keep_b   # clustered: partition-like pruning
    ra = sorted(r["k"] for r in vt.read_where(spark, ta, "k", lo, hi).collect())
    rb = sorted(r["k"] for r in vt.read_where(spark, tb, "k", lo, hi).collect())
    assert ra == rb == list(range(lo, hi + 1))


def test_conjunctive_prune_fast_path_equals_dict_path(spark, tmp_path):
    """files_for_ranges through the manifest: the vectorized AND of
    per-column masks equals the dict path on every bound shape —
    incl. fully-unbounded columns (which must keep all-NULL files,
    files_for_ranges' documented rule) and post-checkpoint files."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(5):
        vt.commit_append(
            spark, t,
            spark.createDataFrame(
                [(i * 10 + j, (i * 10 + j) % 7, f"s{i}{j}") for j in range(3)],
                "k long, m long, v string",
            ).coalesce(1),
            stats_cols=["k", "m", "v"],
        )
    vt.commit_append(
        spark, t,
        spark.createDataFrame([(None, None, None)], "k long, m long, v string")
        .coalesce(1),
        stats_cols=["k", "m", "v"],
    )
    vt.checkpoint_log(spark, t, format="parquet")
    vt.commit_append(
        spark, t,
        spark.createDataFrame([(80, 3, "post")], "k long, m long, v string")
        .coalesce(1),
        stats_cols=["k", "m"],
    )
    vt.reset_metadata_cache()
    stats = vt.file_range_stats(spark, t)
    cases = [
        {"k": (10, 25), "m": (0, 3)},
        {"k": (None, None), "m": (2, 2)},
        {"k": (10, 45), "v": ("s10", "s31")},
        {"k": (1000, None)},
        {"k": (None, None), "m": (None, None)},
    ]
    for ranges in cases:
        fast, tot1 = vt.files_for_ranges(spark, t, dict(ranges))
        slow, tot2 = vt.files_for_ranges(spark, t, dict(ranges), stats=stats)
        assert (fast, tot1) == (slow, tot2), (ranges, fast, slow)
    got = sorted(
        r["k"]
        for r in vt.read_where_all(spark, t, {"k": (10, 25), "m": (0, 3)})
        .collect()
    )
    assert all(10 <= k <= 25 for k in got) and got


def test_point_lookup_through_manifest(spark, tmp_path):
    """files_for_point on a manifest table: stats rule out clustered
    files first, blooms are parsed only for candidates, results exact
    — incl. a post-checkpoint file and a bloomless candidate."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(5):
        vt.commit_append(
            spark, t,
            _mk(spark, [(i * 10 + j, f"s{i}{j}") for j in range(3)]).coalesce(1),
            stats_cols=["k"], bloom_cols=["k"],
        )
    vt.checkpoint_log(spark, t, format="parquet")
    vt.commit_append(
        spark, t, _mk(spark, [(80, "post")]).coalesce(1), stats_cols=["k"]
    )
    vt.reset_metadata_cache()
    keep, total = vt.files_for_point(spark, t, "k", 21)
    assert total == 6
    # stats alone confine the probe to the one file whose range holds
    # 21, plus the bloomless post file is ruled out by ITS stats too
    assert len(keep) == 1, keep
    assert [r["v"] for r in vt.read_point(spark, t, "k", 21).collect()] == ["s21"]
    # absent key: blooms prove absence within the surviving range file
    keep, _ = vt.files_for_point(spark, t, "k", 85)
    assert keep == []
    assert vt.read_point(spark, t, "k", 85).count() == 0
    # post-checkpoint file is a candidate for ITS range and readable
    keep, _ = vt.files_for_point(spark, t, "k", 80)
    assert len(keep) == 1
    assert vt.read_point(spark, t, "k", 80).count() == 1


def test_nan_float_stats_never_skip_real_rows(spark, tmp_path):
    """Spark max() propagates NaN into per-file stats; IEEE makes
    NaN >= lo FALSE, so a naive vectorized prune would skip a file
    that still holds matching non-NaN rows (found by r14 self-review:
    read_where silently LOST a row). NaN bounds must fall to 'keep',
    exactly like the dict path's comparisons."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(
        spark, t,
        spark.createDataFrame(
            [(1, 5.0), (2, float("nan"))], "k long, x double"
        ).coalesce(1),
        stats_cols=["x"],
    )
    vt.commit_append(
        spark, t,
        spark.createDataFrame([(3, 100.0)], "k long, x double").coalesce(1),
        stats_cols=["x"],
    )
    vt.checkpoint_log(spark, t, format="parquet")
    vt.reset_metadata_cache()
    stats = vt.file_range_stats(spark, t)
    for lo, hi in ((1.0, 10.0), (200.0, 300.0), (None, 10.0), (6.0, None)):
        fast, _ = vt.files_for_range(spark, t, "x", lo, hi)
        slow, _ = vt.files_for_range(spark, t, "x", lo, hi, stats=stats)
        assert fast == slow, (lo, hi, fast, slow)
    # the row the pre-fix path lost
    assert [r["k"] for r in vt.read_where(spark, t, "x", 1.0, 10.0).collect()] == [1]
    # conjunctive path too
    fast, _ = vt.files_for_ranges(spark, t, {"x": (1.0, 10.0)})
    slow, _ = vt.files_for_ranges(spark, t, {"x": (1.0, 10.0)}, stats=stats)
    assert fast == slow
