"""Metadata-at-scale rehearsal (r13 VERDICT #3, SCALE §14): synthetic
N-file commit logs (metadata only — planning never opens data files),
measured cold on both checkpoint shapes:

- JSON checkpoint: one blob with every live file + stats; every cold
  read parses all of it on the driver.
- Parquet manifest: light JSON + columnar per-file state; cold reads
  load only the columns the operation touches.

Measures, per N and per shape:
  ck_bytes        checkpoint footprint on disk (json [+ manifest])
  json_bytes      driver-parsed JSON bytes for a cold live-list read
                  (the single-threaded-parse cost the manifest kills)
  replay_s        cold _replay_state wall (live-list planning)
  prune_s         cold files_for_range wall (selective range)
  survivors       files the range keeps (sanity: both shapes agree)

Usage: python tools/manifest_rehearsal.py [N ...]   (default 10000 30000 100000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gedixr_spark.sinks import versioned as vt  # noqa: E402

SCHEMA = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ],
})


def build_log(root: str, n_files: int, files_per_commit: int = 1000) -> str:
    t = os.path.join(root, f"t{n_files}")
    os.makedirs(vt._log_dir(t))
    os.makedirs(vt._data_dir(t))
    e0 = {"version": 0, "op": "create", "ts": 1000.0, "add": [],
          "remove": [], "schema": None, "meta": {}}
    with open(os.path.join(vt._log_dir(t), vt._entry_name(0)), "w") as f:
        json.dump(e0, f)
    v, i = 0, 0
    while i < n_files:
        v += 1
        batch = [f"v{v:08d}-f{j:07d}.parquet"
                 for j in range(i, min(i + files_per_commit, n_files))]
        stats = {
            name: {"__nrows": 100, "k": [j * 100, j * 100 + 99]}
            for j, name in zip(range(i, i + len(batch)), batch)
        }
        e = {"version": v, "op": "append", "ts": 1000.0 + v,
             "add": batch, "remove": [], "schema": SCHEMA,
             "stats": stats, "meta": {}}
        with open(os.path.join(vt._log_dir(t), vt._entry_name(v)), "w") as f:
            json.dump(e, f)
        i += len(batch)
    return t


def _du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(path) for f in fs
    )


def measure(spark, t: str, n_files: int, fmt: str) -> dict:
    r = vt.checkpoint_log(spark, t, format=fmt)
    assert r["format"] == fmt and r["n_live"] == n_files
    ld = vt._strip_scheme(vt._log_dir(t))
    cap = r["version"]
    ck_json = os.path.getsize(os.path.join(ld, f"checkpoint-{cap:08d}.json"))
    mf = os.path.join(ld, f"checkpoint-{cap:08d}-manifest.parquet")
    ck_bytes = ck_json + (os.path.getsize(mf) if os.path.exists(mf) else 0)

    def cold(fn, n=3):
        best = None
        for _ in range(n):
            vt.reset_metadata_cache()
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    replay_s, live = cold(lambda: vt._replay_state(spark, t, cap))
    assert len(live[0]) == n_files
    # selective range: ~0.1% of files overlap
    lo, hi = n_files * 50, n_files * 50 + n_files // 10
    prune_s, keep = cold(
        lambda: vt.files_for_range(spark, t, "k", lo, hi, version=cap)
    )
    return {
        "format": fmt, "n_files": n_files,
        "ck_bytes": ck_bytes, "json_bytes": ck_json,
        "replay_s": round(replay_s, 4), "prune_s": round(prune_s, 4),
        "survivors": len(keep[0]),
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [10_000, 30_000, 100_000]
    from gedixr_spark.session import get_spark

    spark = get_spark("manifest-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="manifest_rehearsal_")
    rows = []
    try:
        for n in ns:
            t = build_log(root, n)
            for fmt in ("json", "parquet"):
                rec = measure(spark, t, n, fmt)
                rows.append(rec)
                print(json.dumps(rec))
        # equivalence: both formats at each N keep the same survivor count
        by_n: dict = {}
        for r in rows:
            by_n.setdefault(r["n_files"], set()).add(r["survivors"])
        assert all(len(s) == 1 for s in by_n.values()), by_n
        print(json.dumps({"equivalent": True, "ns": ns}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
