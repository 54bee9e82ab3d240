"""Parquet checkpoint manifests OFF the local filesystem (r14 VERDICT
#1): `checkpoint_log(format="parquet")` must work wherever a 100 TB
table actually lives. The non-local branch is scheme-forced the way
the HDFS CommitGuard branch is tested: `_is_local_path` is
monkeypatched to False, so every metadata read/write routes through
the JVM Hadoop filesystem (which resolves plain paths onto local disk)
— the manifest is written via buffer + temp+rename and read back via
one cached whole-file fetch with column-projected decode.

Extension-layer surface (no reference parity)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.test_parquet_checkpoint import _lifecycle, _mk, _snapshot, _vt


@pytest.fixture()
def remote(monkeypatch):
    """Force every `_is_local_path` decision in the versioned sink to
    the non-local branch. Commits stay atomic (the guard checks the
    scheme directly); all checkpoint/manifest I/O goes through the JVM
    filesystem."""
    vt = _vt()
    monkeypatch.setattr(vt, "_is_local_path", lambda p: False)
    yield vt
    vt.reset_metadata_cache()


def test_remote_twin_lifecycle_agrees(spark, tmp_path, remote):
    """The full r14 twin-lifecycle comparison, scheme-forced through
    the non-local branch: a parquet-manifest checkpoint written and
    read remotely must agree with the JSON twin on every surface,
    including post-expiry cold reads."""
    vt = remote
    tj, tp = str(tmp_path / "json"), str(tmp_path / "parq")
    cap_j = _lifecycle(spark, vt, tj)
    cap_p = _lifecycle(spark, vt, tp)
    assert cap_j == cap_p
    rj = vt.checkpoint_log(spark, tj, format="json")
    rp = vt.checkpoint_log(spark, tp, format="parquet")
    assert rj["format"] == "json" and rp["format"] == "parquet"

    # the light JSON is O(1) driver bytes and references the manifest;
    # the manifest parquet exists; no .tmp litter was left behind
    ld = os.path.join(tp, "_log")
    light = json.loads(
        open(os.path.join(ld, f"checkpoint-{cap_p:08d}.json"), "rb").read()
    )
    assert light["manifest"] == f"checkpoint-{cap_p:08d}-manifest.parquet"
    assert os.path.exists(os.path.join(ld, light["manifest"]))
    assert not [n for n in os.listdir(ld) if n.endswith(".tmp")]

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
    assert vt.seen_stream_batch_ids(spark, tj) == \
        vt.seen_stream_batch_ids(spark, tp)
    assert vt._latest_schema(spark, tj, None) == \
        vt._latest_schema(spark, tp, None)

    vt.expire_log(spark, tj)
    vt.expire_log(spark, tp)
    vt.reset_metadata_cache()
    assert _snapshot(spark, vt, tj) == _snapshot(spark, vt, tp)
    df = vt.read_versioned(spark, tp)
    assert df.filter(F.col("k") == 0).collect()[0]["d"] == "dflt"
    assert df.filter(F.col("k") == 21).count() == 0


def test_remote_range_prune_fast_path_equals_dict_path(spark, tmp_path, remote):
    """Vectorized manifest pruning over the remotely-fetched manifest
    equals the exact dict path — same survivors, same totals."""
    vt = remote
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(6):
        vt.commit_append(
            spark, t,
            _mk(spark, [(i * 100 + j, f"x{j}") for j in range(5)]).coalesce(1),
            stats_cols=["k"],
        )
    vt.checkpoint_log(spark, t, format="parquet")
    vt.commit_append(
        spark, t, _mk(spark, [(10_000, "post")]).coalesce(1), stats_cols=["k"]
    )
    live = vt.live_files(spark, t)
    stats = vt.file_range_stats(spark, t)
    for lo, hi in [(None, None), (0, 150), (250, None), (None, 320), (99999, None)]:
        fast, n_fast = vt.files_for_range(spark, t, "k", lo, hi)
        exact, n_exact = vt.files_for_range(
            spark, t, "k", lo, hi, files=live, stats=stats
        )
        assert sorted(fast) == sorted(exact), (lo, hi)
        assert n_fast == n_exact
    # and the scan results agree with a full-scan filter
    got = sorted(
        r["k"] for r in vt.read_where(spark, t, "k", 250, None).collect()
    )
    want = sorted(
        r["k"]
        for r in vt.read_versioned(spark, t).filter(F.col("k") >= 250).collect()
    )
    assert got == want


def test_remote_auto_format_flips_at_threshold(spark, tmp_path, remote, monkeypatch):
    """`auto` no longer forces JSON off the local filesystem: past the
    live-set threshold a remote table gets the manifest shape too."""
    vt = remote
    monkeypatch.setattr(vt, "_CK_MANIFEST_MIN_FILES", 2)
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    for i in range(3):
        vt.commit_append(spark, t, _mk(spark, [(i, "a")]).coalesce(1))
    out = vt.checkpoint_log(spark, t)  # auto
    assert out["format"] == "parquet"
    vt.reset_metadata_cache()
    assert len(vt.read_versioned(spark, t).collect()) == 3


def test_remote_recheckpoint_overwrites_cleanly(spark, tmp_path, remote):
    """Checkpoints are overwrite-safe derived data: re-running
    checkpoint_log at the same version through the remote branch must
    republish the manifest (delete + rename), not fail or tear."""
    vt = remote
    t = str(tmp_path / "t")
    vt.init_versioned(spark, t)
    vt.commit_append(spark, t, _mk(spark, [(1, "a"), (2, "b")]), stats_cols=["k"])
    r1 = vt.checkpoint_log(spark, t, format="parquet")
    r2 = vt.checkpoint_log(spark, t, format="parquet")
    assert r1["version"] == r2["version"]
    vt.reset_metadata_cache()
    assert len(vt.read_versioned(spark, t).collect()) == 2
    ld = os.path.join(t, "_log")
    assert not [n for n in os.listdir(ld) if n.endswith(".tmp")]
