"""Multi-table atomic publish — a tiny versioned CATALOG over
versioned tables.

Single-table commits are atomic, but a training run reads SEVERAL
tables that must agree: documents + the tf index derived from them,
embeddings + the vector index, corpus + its split assignment. Writers
advance each table with its own commits; nothing ties "documents v7"
to "tf-index v4". The catalog closes that gap with the lakehouse
pattern (Delta calls the equivalent a commit coordinator / multi-table
transaction; Iceberg a catalog pointer swap): a catalog VERSION is one
atomically-created log entry pinning {table name -> (path, version)}.
Readers resolve the catalog first and then time-travel every table to
its pinned version, so they always observe a CONSISTENT cross-table
snapshot — a writer that advanced `documents` but crashed before
publishing leaves readers on the previous (docs, index) pair, never on
a torn one.

Atomicity rides the SAME `CommitGuard` primitive as table commits
(exclusive create of the next numbered entry; the optimistic loser
gets `ConcurrentCommitError`), so everything proven about table-commit
races — including the fake-object-store lost-commit test — carries
over. `publish(..., expected=...)` adds compare-and-publish: refresh
jobs can assert the pins they derived FROM are still current, which
turns "rebuild index from docs v7, publish both" into a serializable
read-modify-write across tables.

Scale shape: catalog entries are O(#tables) JSON — no data movement,
no Spark jobs beyond metadata reads. Vacuum caveat (same as Delta):
pinning a version in the catalog does NOT protect that version's data
files from `vacuum_versioned` on the table — retention policy must
cover the oldest pinned catalog version.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from gedixr_spark.sinks.versioned import (
    ConcurrentCommitError,
    _atomic_create,
    _entry_name,
    _hadoop_fs,
    _list_log_versions,
    _log_dir,
    _read_entry,
    read_versioned,
)


def init_catalog(spark: SparkSession, path: str) -> dict:
    """Create an empty catalog at ``path`` (version 0, no pins)."""
    fs, _ = _hadoop_fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    if fs.exists(jpath(_log_dir(path))):
        raise ValueError(f"catalog already exists at {path}")
    fs.mkdirs(jpath(_log_dir(path)))
    entry = {
        "version": 0,
        "op": "create",
        "ts": int(time.time() * 1000) / 1000.0,
        "pins": {},
        "meta": {},
    }
    payload = json.dumps(entry, sort_keys=True).encode("utf-8")
    if not _atomic_create(spark, _log_dir(path) + "/" + _entry_name(0), payload):
        raise ConcurrentCommitError(f"version 0 already committed at {path}")
    return entry


def catalog_history(spark: SparkSession, path: str) -> list[dict]:
    """All catalog entries, oldest first."""
    return [_read_entry(spark, path, v) for v in _list_log_versions(spark, path)]


def read_pins(
    spark: SparkSession, path: str, version: int | None = None
) -> dict[str, dict]:
    """The pin set {name: {"path", "version"}} at catalog ``version``
    (latest when None)."""
    versions = _list_log_versions(spark, path)
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"catalog version {v} does not exist at {path}")
    return _read_entry(spark, path, v)["pins"]


def publish(
    spark: SparkSession,
    path: str,
    pins: dict[str, dict],
    meta: dict | None = None,
    expected: dict[str, int] | None = None,
) -> dict:
    """Atomically publish a new catalog version pinning every table in
    ``pins`` ({name: {"path": table_path, "version": int | None}};
    None resolves to the table's CURRENT latest version). Tables not
    named keep their previous pins — a publish updates, never
    implicitly drops.

    Every pinned version is validated against the table's own log
    before the entry is written, so the catalog can never point at a
    version that was never committed.

    ``expected`` ({name: version}) is the compare-and-publish guard: if
    the CURRENT catalog pins any named table at a different version,
    raise `ConcurrentCommitError` without publishing — the caller's
    derived data (an index rebuilt from docs v7) is stale and must be
    recomputed. The exclusive-create on the entry file then closes the
    remaining race window exactly as table commits do."""
    versions = _list_log_versions(spark, path)
    base = versions[-1]
    current = _read_entry(spark, path, base)["pins"]
    if expected:
        for name, want in expected.items():
            have = current.get(name, {}).get("version")
            if have != want:
                raise ConcurrentCommitError(
                    f"compare-and-publish failed: catalog pins {name!r} at "
                    f"{have}, caller expected {want}"
                )
    resolved = dict(current)
    for name, pin in pins.items():
        tpath = pin["path"]
        tversions = _list_log_versions(spark, tpath)
        v = pin.get("version")
        if v is None:
            v = tversions[-1]
        elif v not in tversions:
            raise ValueError(
                f"cannot pin {name!r} at version {v}: not in the table log "
                f"at {tpath}"
            )
        resolved[name] = {"path": tpath, "version": int(v)}
    entry = {
        "version": base + 1,
        "op": "publish",
        "ts": int(time.time() * 1000) / 1000.0,
        "pins": resolved,
        "meta": meta or {},
    }
    payload = json.dumps(entry, sort_keys=True).encode("utf-8")
    full = _log_dir(path) + "/" + _entry_name(base + 1)
    if not _atomic_create(spark, full, payload):
        raise ConcurrentCommitError(
            f"catalog version {base + 1} already committed at {path} "
            "(concurrent publisher won)"
        )
    return entry


def publish_latest(
    spark: SparkSession,
    path: str,
    tables: dict[str, str],
    meta: dict | None = None,
    expected: dict[str, int] | None = None,
) -> dict:
    """Pin every table in ``tables`` ({name: table_path}) at its
    current latest version, as one atomic catalog entry."""
    return publish(
        spark,
        path,
        {name: {"path": p, "version": None} for name, p in tables.items()},
        meta=meta,
        expected=expected,
    )


def read_table(
    spark: SparkSession,
    path: str,
    name: str,
    catalog_version: int | None = None,
) -> DataFrame:
    """Read table ``name`` exactly as the catalog snapshot pins it —
    the consistent-cross-table read path. Time-traveling the CATALOG
    (``catalog_version``) time-travels every table with it."""
    pins = read_pins(spark, path, catalog_version)
    if name not in pins:
        raise ValueError(f"table {name!r} is not pinned in the catalog at {path}")
    pin = pins[name]
    return read_versioned(spark, pin["path"], version=pin["version"])
