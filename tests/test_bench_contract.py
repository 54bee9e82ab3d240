"""bench.py driver contract: the FINAL stdout line must be the compact
metric JSON with every registry query — the exact invariant whose
violation lost round 4's perf record (BENCH_r04.json parsed: null when
the line grew past the driver's tail-capture window).

Runs the real bench as a subprocess at sf0.001 with runs=1 so the
check costs ~1 min, not the full sf0.1 triple run."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_final_line_is_compact_parseable_metric():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_CPUS="4",
    )
    # the committed sf0.1 adjudication diag must SURVIVE this sf0.001
    # subprocess run (VERDICT r14 'what's wrong' #1: the r14 close
    # clobbered the min-of-3 diag with a suite run's record)
    last_diag = os.path.join(REPO, "BENCH_DIAG_last.json")
    before = (
        open(last_diag, "rb").read() if os.path.exists(last_diag) else None
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    final = lines[-1]
    # the driver parses exactly the final line — it must be the metric
    # record, stand alone, and compact (diagnostics on earlier lines)
    d = json.loads(final)
    assert d["metric"] == "gedixr_spark_contract_queries_total"
    assert d["unit"] == "sec" and d["value"] > 0
    assert set(d["queries"]) == set(entry.queries()), (
        "bench must time every registry query"
    )
    assert "spread" not in d, "diagnostics belong on a preceding line"
    # compactness guard: well inside any plausible tail-capture window
    assert len(final) < 4000, len(final)
    # the preceding diagnostics line exists and carries the spread map
    diag = json.loads(lines[-2])
    assert "spread" in diag and "runs_per_query" in diag
    # sf0.001 diagnostics landed in the sf-suffixed scratch file; the
    # sf0.1 adjudication record is byte-identical to before
    after = (
        open(last_diag, "rb").read() if os.path.exists(last_diag) else None
    )
    assert after == before, "sf0.001 bench run must not clobber the sf0.1 diag"
    scratch = os.path.join(REPO, "BENCH_DIAG_sf0.001.json")
    assert os.path.exists(scratch)
    assert "spread" in json.load(open(scratch))


def test_prev_record_parser_reads_real_driver_record(tmp_path):
    """The regression-rerun gate reads the PREVIOUS round's per-query
    timings. Driver records nest them under "parsed" — VERDICT r9 #1:
    reading only a top-level "queries" key made prev always empty and
    the >1.5x trigger dead code. Parse the real committed record AND a
    bare metric-line record so the gate can't silently die again."""
    import glob

    from bench import load_prev_timings

    recs = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert recs, "committed driver records must exist"
    prev = load_prev_timings(recs[-1])
    assert len(prev) >= 50, (
        "a real driver record must yield the full per-query timing map, "
        f"got {len(prev)}"
    )
    assert all(isinstance(v, float) and v > 0 for v in prev.values())

    # sf gating: the driver record is sf0.1 — a local sf0.001 run must
    # NOT gate against it (cross-SF "regressions" would waste rerun
    # rounds), while the matching sf still loads the full map
    assert load_prev_timings(recs[-1], "0.1") == prev
    assert load_prev_timings(recs[-1], "0.001") == {}

    # bare metric line (local bench run saved directly)
    bare = tmp_path / "bare.json"
    bare.write_text(json.dumps({"metric": "m", "queries": {"q1": 0.5}}))
    assert load_prev_timings(str(bare)) == {"q1": 0.5}
    # bare line with sf present: gated the same way
    bare.write_text(
        json.dumps({"metric": "m", "sf": "0.1", "queries": {"q1": 0.5}})
    )
    assert load_prev_timings(str(bare), "0.1") == {"q1": 0.5}
    assert load_prev_timings(str(bare), "0.01") == {}

    # sf compare is NUMERIC: a float-recorded sf 1.0 must match the
    # dir-derived string "1" (ADVICE r10: str() compare silently
    # disabled the gate at integral SFs)
    bare.write_text(
        json.dumps({"metric": "m", "sf": 1.0, "queries": {"q1": 0.5}})
    )
    assert load_prev_timings(str(bare), "1") == {"q1": 0.5}
    assert load_prev_timings(str(bare), "1.0") == {"q1": 0.5}
    assert load_prev_timings(str(bare), "0.1") == {}

    # corrupt / missing files degrade to empty, never raise
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert load_prev_timings(str(bad)) == {}
    assert load_prev_timings(str(tmp_path / "nope.json")) == {}

    # the gate condition itself: with a real prev map, a 2.06x
    # min (the exact crs_transform shape that shipped unchecked in
    # r9) MUST trigger a rerun
    name, prev_min = next(iter(prev.items()))
    m = 2.06 * prev_min + 0.4
    regressed = name in prev and m > 1.5 * prev[name] and m - prev[name] > 0.3
    assert regressed


def test_calibration_drift_normalizes_regression_gate(tmp_path):
    """VERDICT r10 #3: the rerun gate must compare fresh minima against
    prev×(calib/prev_calib) so a uniformly slow host (every query AND
    the fixed calibration workload ~1.4× slower) fires ZERO reruns,
    while a genuine single-query regression on a steady host still
    fires."""
    import json as _json

    from bench import load_prev_calib, load_prev_timings

    rec = tmp_path / "BENCH_r99.json"
    rec.write_text(
        _json.dumps(
            {
                "parsed": {
                    "metric": "m",
                    "sf": 0.1,
                    "calib_s": 2.0,
                    "queries": {"q1": 1.0, "q2": 4.0},
                }
            }
        )
    )
    prev = load_prev_timings(str(rec), "0.1")
    assert prev == {"q1": 1.0, "q2": 4.0}
    prev_calib = load_prev_calib(str(rec))
    assert prev_calib == 2.0

    def gate(m, name, calib_s):
        drift = min(max(calib_s / prev_calib, 0.5), 3.0)
        bar = prev.get(name, 0.0) * drift
        return name in prev and m > 1.5 * bar and m - bar > 0.3

    # uniformly 1.6x slower host: q1 at 1.6s would trip the raw gate
    # (1.6 > 1.5*1.0) — with calib also 1.6x, it must NOT fire
    assert not gate(1.6, "q1", calib_s=3.2)
    # real regression on a steady host still fires
    assert gate(2.2, "q1", calib_s=2.0)
    # real regression is NOT masked by modest drift: 3x the query on a
    # 1.2x host still fires
    assert gate(3.0, "q1", calib_s=2.4)
    # records without calib degrade to the raw gate (drift stays 1.0
    # in main() when either side is missing)
    rec2 = tmp_path / "BENCH_r98.json"
    rec2.write_text(_json.dumps({"parsed": {"metric": "m"}}))
    assert load_prev_calib(str(rec2)) is None
    assert load_prev_calib(str(tmp_path / "nope.json")) is None


def test_scratch_root_is_private_and_process_scoped(spark):
    """The scratch root is an unpredictable mkdtemp dir (0700, unique
    per process) reused across calls — two concurrent driver processes
    can never wipe each other's live scratch files and no other user
    can pre-own the path (r7 ADVICE, medium). Same-basename data dirs
    must not collide on cached index metadata either: _sf_key hashes
    the FULL path."""
    import os
    import stat

    from gedixr_spark.contract_ext import _scratch_dir, _scratch_root, _sf_key

    root = _scratch_root()
    assert _scratch_root() == root  # cached per process
    assert os.path.basename(root).startswith("gedixr_scratch_")
    assert len(os.path.basename(root)) > len("gedixr_scratch_")  # random suffix
    mode = stat.S_IMODE(os.stat(root).st_mode)
    assert mode == 0o700, oct(mode)

    d1 = _scratch_dir("x", "k")
    assert d1.startswith(root)
    open(os.path.join(d1, "f"), "w").write("1")
    d2 = _scratch_dir("x", "k")  # same key → wiped
    assert d2 == d1 and not os.listdir(d2)

    assert _sf_key("/a/data/sf0.1") != _sf_key("/b/data/sf0.1")
    assert _sf_key("/a/data/sf0.1") == _sf_key("/a/data/sf0.1/")


def test_axis_rule_normalizes_overhead_bound_queries(tmp_path):
    """r12 VERDICT #6: overhead-bound queries (commit/iteration-bound)
    compare against prev×(calib_sched/prev_calib_sched), scan-bound
    ones against prev×(calib/prev_calib) — the r12 drift episode had
    the two axes moving OPPOSITE ways (scan 0.79, scheduler ~1.3) and
    a single-axis gate burned reruns on unchanged code."""
    import json

    from bench import OVERHEAD_BOUND, load_prev_calib, load_prev_timings

    rec = tmp_path / "BENCH_r99.json"
    rec.write_text(
        json.dumps(
            {
                "parsed": {
                    "queries": {"month_filter": 1.0, "versioned_snapshot": 5.0},
                    "sf": 0.1,
                    "calib_s": 2.0,
                    "calib_sched_s": 2.0,
                }
            }
        )
    )
    assert "versioned_snapshot" in OVERHEAD_BOUND
    assert "month_filter" not in OVERHEAD_BOUND
    prev = load_prev_timings(str(rec), "0.1")
    prev_calib = load_prev_calib(str(rec))
    prev_sched = load_prev_calib(str(rec), key="calib_sched_s")
    assert (prev_calib, prev_sched) == (2.0, 2.0)

    def gate(name, m, calib_s, calib_sched_s):
        drift = min(max(calib_s / prev_calib, 0.5), 3.0)
        sched_drift = min(max(calib_sched_s / prev_sched, 0.5), 3.0)
        q_drift = sched_drift if name in OVERHEAD_BOUND else drift
        bar = prev[name] * q_drift
        return m > 1.5 * bar and m - bar > 0.3

    # scheduler axis 1.4x slower, scan axis flat: versioned_snapshot at
    # 8.0s (1.6x raw) is drift, not regression — sched-normalized bar
    # is 5.0*1.4=7.0, 8.0 < 1.5*7.0
    assert not gate("versioned_snapshot", 8.0, calib_s=2.0, calib_sched_s=2.8)
    # but under the SCAN axis the same number would have fired
    assert 8.0 > 1.5 * (5.0 * min(max(2.0 / 2.0, 0.5), 3.0))
    # a genuine regression still fires on the sched axis
    assert gate("versioned_snapshot", 12.0, calib_s=2.0, calib_sched_s=2.8)
    # scan-bound queries keep using the scan axis: month_filter at 1.6s
    # with sched drifted but scan flat IS flagged
    assert gate("month_filter", 1.6, calib_s=2.0, calib_sched_s=2.8)


def test_derived_axis_from_measured_jobs():
    """r13 VERDICT #4: the axis comes from MEASURED job counts —
    jobs × per-job scheduler latency ≥ half the wall ⇒ sched-bound —
    with OVERHEAD_BOUND as a forced override for the driver-action
    families whose waits job counts under-measure, and a fallback when
    measurement is unavailable."""
    from bench import OVERHEAD_BOUND, derive_axis

    per_job = 1.5 / 30  # 0.05 s/job host
    # measured: 60 jobs over a 5 s wall = 3 s of scheduler floor
    assert derive_axis("anything", 5.0, 60, per_job) == "sched"
    # measured: 5 jobs over a 5 s wall = 0.25 s floor -> scan
    assert derive_axis("anything", 5.0, 5, per_job) == "scan"
    # the judge's binary_payload_meta shape: 4 jobs, 0.28 s wall —
    # scheduler-floor-sized even though the old hand list said scan
    assert derive_axis("binary_payload_meta", 0.28, 4, per_job) == "sched"
    # override: lifecycle queries stay sched even when job counts
    # under-measure their driver-action walls
    assert "index_maintenance" in OVERHEAD_BOUND
    assert derive_axis("index_maintenance", 3.4, 29, per_job) == "sched"
    # fallback without measurement: the hand list decides
    assert derive_axis("versioned_snapshot", 5.0, None, None) == "sched"
    assert derive_axis("month_filter", 0.5, None, None) == "scan"
