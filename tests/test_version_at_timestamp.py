"""version_at_timestamp via binary search (r12 VERDICT #5): O(log n)
entry reads on a long log, same answers as the linear scan — including
the ts=0 legacy-entry rule — plus the instrumented probe-count bound.
"""

import json
import math
import os

import pytest

from gedixr_spark.sinks.versioned import (
    _entry_name,
    _log_dir,
    metadata_cache_stats,
    reset_metadata_cache,
    version_at_timestamp,
)


def _write_log(t: str, stamps: dict[int, float | None]) -> None:
    """Hand-write a log whose entry v carries ts=stamps[v] (None omits
    the field — the pre-ts legacy shape)."""
    os.makedirs(_log_dir(t))
    for v, ts in stamps.items():
        e = {
            "version": v,
            "op": "create" if v == 0 else "note",
            "add": [],
            "remove": [],
            "schema": None,
            "meta": {},
        }
        if ts is not None:
            e["ts"] = ts
        with open(os.path.join(_log_dir(t), _entry_name(v)), "w") as f:
            json.dump(e, f)


def _linear_reference(stamps: dict[int, float | None], ts: float):
    best = None
    for v in sorted(stamps):
        if (stamps[v] or 0.0) <= ts:
            best = v
    return best


def test_matches_linear_scan_everywhere(spark, tmp_path):
    t = str(tmp_path / "ts_long")
    n = 201
    stamps: dict[int, float | None] = {v: 1000.0 + v * 2 for v in range(n)}
    # legacy prefix: three entries without the ts field (sort as 0)
    stamps[0] = stamps[1] = stamps[2] = None
    _write_log(t, stamps)
    reset_metadata_cache()
    targets = [
        0.0, 999.9, 1000.0, 1006.0, 1007.0, 1100.5, 1399.0,
        1000.0 + 2 * (n - 1), 1e9,
    ]
    for ts in targets:
        want = _linear_reference(stamps, ts)
        assert version_at_timestamp(spark, t, ts) == want, ts
    with pytest.raises(ValueError, match="no version"):
        # a log whose FIRST entry is younger than the target
        t2 = str(tmp_path / "ts_young")
        _write_log(t2, {0: 5000.0, 1: 5001.0})
        version_at_timestamp(spark, t2, 4999.0)


def test_probe_count_is_logarithmic(spark, tmp_path):
    t = str(tmp_path / "ts_probes")
    n = 200
    _write_log(t, {v: 1000.0 + v for v in range(n)})
    reset_metadata_cache()
    before = metadata_cache_stats()
    b0 = before["entry_reads"] + before["entry_hits"]
    assert version_at_timestamp(spark, t, 1000.0 + 117) == 117
    after = metadata_cache_stats()
    probes = (after["entry_reads"] + after["entry_hits"]) - b0
    bound = math.ceil(math.log2(n)) + 4
    assert probes <= bound, f"{probes} entry reads > {bound} for n={n}"


def test_duplicate_timestamps_pick_newest(spark, tmp_path):
    t = str(tmp_path / "ts_dup")
    stamps = {0: 1000.0, 1: 2000.0, 2: 2000.0, 3: 2000.0, 4: 3000.0}
    _write_log(t, stamps)
    reset_metadata_cache()
    assert version_at_timestamp(spark, t, 2000.0) == 3
    assert version_at_timestamp(spark, t, 2999.9) == 3
    assert version_at_timestamp(spark, t, 3000.0) == 4
