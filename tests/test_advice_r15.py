"""r14 ADVICE regressions:

- cross-process re-create whose NEW log starts at a HIGHER version
  than the old oldest (the guard's former log-expiry assumption) is
  detected — overlapping cached entries from the dead table are never
  served;
- legitimate in-process log expiry still keeps its warm caches (the
  new-oldest identity check passes on the just-read checkpoint entry);
- `_LazyCheckpoint` loads return PRIVATE copies — mutating a returned
  structure never poisons `_MANIFEST_CACHE` for later callers;
- bench.py's per-job scheduler latency and `calibrate_scheduler` share
  one N_CALIB_JOBS constant (a changed default must not silently skew
  axis derivation).

Extension-layer surface (no reference parity — the reference engine
has no versioned tables)."""

from __future__ import annotations

import inspect
import shutil


def _vt():
    from gedixr_spark.sinks import versioned as vt
    return vt


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_recreate_with_advanced_oldest_is_detected(spark, tmp_path):
    """Table B (log expired — its oldest entry version is HIGHER than
    table A's) is swapped over A's path out-of-band. A's cached entries
    for the overlapping versions must not survive: the old guard
    treated any oldest-advance as log expiry and would have served A's
    stale entry bytes for versions 4..5 under B's checkpoint."""
    vt = _vt()
    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    # A: versions 0..8, all entries warm in cache, NO checkpoint
    vt.init_versioned(spark, ta)
    for i in range(8):
        vt.commit_append(spark, ta, _mk(spark, [(i, f"old-{i}")]))
    assert len(vt.read_versioned(spark, ta).collect()) == 8

    # B: checkpoint at version 5 + expire (oldest becomes 5), then two
    # post-checkpoint commits (6, 7). After the swap a replay is B's
    # ck5 + entries 6..7 — version numbers A holds WARM CACHED entries
    # for, so the old guard ("oldest advanced = log expiry, keep
    # caches") would have served A's dead bytes for them.
    vt.init_versioned(spark, tb)
    for i in range(5):
        vt.commit_append(
            spark, tb, _mk(spark, [(100 + i, f"brand-new-row-{i}-{'x' * i}")])
        )
    vt.checkpoint_log(spark, tb, format="json")
    vt.expire_log(spark, tb)
    for i in range(2):
        vt.commit_append(
            spark, tb, _mk(spark, [(200 + i, f"post-expiry-{i}")])
        )
    b_versions = vt._list_log_versions(spark, tb)
    assert b_versions[0] > 0  # B's oldest genuinely advanced past A's
    assert set(b_versions) & set(range(9))  # and overlaps A's cached range

    shutil.rmtree(ta)
    shutil.copytree(tb, ta, copy_function=shutil.copy)

    got = {r["k"] for r in vt.read_versioned(spark, ta).collect()}
    want = {r["k"] for r in vt.read_versioned(spark, tb).collect()}
    assert got == want
    assert all(k >= 100 for k in got)  # nothing from dead table A


def test_in_process_expiry_keeps_warm_caches(spark, tmp_path):
    """The advance-path identity check must NOT tax normal expiry: the
    checkpoint entry was just read while checkpointing, so its cached
    bytes match the listing and the surviving caches stay warm."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(4):
        vt.commit_append(spark, t, _mk(spark, [(i, f"v{i}")]))
    vt.checkpoint_log(spark, t, format="json")
    vt.expire_log(spark, t)
    # warm the post-expiry state once
    assert len(vt.read_versioned(spark, t).collect()) == 4
    vt.reset_metadata_cache(stats_only=True)
    assert len(vt.read_versioned(spark, t).collect()) == 4
    stats = vt.metadata_cache_stats()
    assert stats["entry_reads"] == 0, (
        "warm re-read after in-process expiry must be served from "
        f"cache, got {stats}"
    )


def test_lazy_checkpoint_loads_are_private_copies(spark, tmp_path):
    """Mutating a structure returned by a `_LazyCheckpoint` field load
    must not change what the next caller sees (the JSON checkpoint
    path re-parses per call; the manifest path must honor the same
    contract instead of sharing _MANIFEST_CACHE internals)."""
    vt = _vt()
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(
        spark, t, spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, x double"),
        stats_cols=["k", "x"],
    )
    vt.checkpoint_log(spark, t, format="parquet")
    ck = vt._read_checkpoint(spark, t, vt._list_log_versions(spark, t)[-1])
    assert isinstance(ck, vt._LazyCheckpoint)

    st1 = ck["stats"]
    f = next(iter(st1))
    col = next(iter(st1[f]))
    st1[f][col] = [999_999, 999_999]  # poison attempt on inner dict
    st1["__injected__"] = {}          # and on the outer map
    st2 = ck["stats"]
    assert "__injected__" not in st2
    assert st2[f][col] != [999_999, 999_999]

    live1 = ck["live"]
    live1.append("not-a-file")
    assert "not-a-file" not in ck["live"]


def test_bench_calibration_jobs_share_one_constant():
    import bench

    sig = inspect.signature(bench.calibrate_scheduler)
    assert sig.parameters["n_jobs"].default == bench.N_CALIB_JOBS
