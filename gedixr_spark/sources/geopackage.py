"""GeoPackage source without geo libraries (S5's .gpkg path,
reference xr.py:44-53 suffix dispatch).

A GeoPackage is a SQLite database (stdlib sqlite3 reads it) whose
feature tables store geometry as "GeoPackage Binary": an 8-byte-plus
header (magic 'GP', version, flags, SRS id, optional envelope) followed
by standard WKB (OGC GeoPackage spec §2.1.3, public). Point WKB decodes
with the same 21-byte layout the engine's sink writes.

Driver-side read → spark.createDataFrame: GeoPackages in this pipeline
are AOI-sized or single-run extraction outputs, not 100 TB tables — the
bronze path for big data is parquet.
"""

from __future__ import annotations

import sqlite3
import struct
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_ENVELOPE_SIZES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def parse_gpkg_geometry(blob: bytes) -> tuple[float, float]:
    """GeoPackage Binary → (x, y) for Point geometry."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage Binary geometry (missing GP magic)")
    flags = blob[3]
    envelope_ind = (flags >> 1) & 0b111
    little = flags & 1
    offset = 8 + _ENVELOPE_SIZES.get(envelope_ind, 0)
    wkb = blob[offset:]
    byte_order = "<" if wkb[0] == 1 else ">"
    (geom_type,) = struct.unpack_from(f"{byte_order}I", wkb, 1)
    if geom_type % 1000 != 1:  # Point (allowing Z/M variants' base type)
        raise ValueError(f"only Point geometry supported, got WKB type {geom_type}")
    x, y = struct.unpack_from(f"{byte_order}dd", wkb, 5)
    return x, y


def list_feature_tables(path: str | Path) -> list[tuple[str, str]]:
    """(table_name, geometry_column) pairs from gpkg metadata."""
    with sqlite3.connect(path) as con:
        rows = con.execute(
            "SELECT c.table_name, g.column_name "
            "FROM gpkg_contents c JOIN gpkg_geometry_columns g "
            "ON c.table_name = g.table_name WHERE c.data_type = 'features'"
        ).fetchall()
    return [(t, c) for t, c in rows]


def read_geopackage(
    spark: SparkSession, path: str | Path, table: str | None = None
) -> DataFrame:
    """Read a GeoPackage feature table into a shot-style DataFrame:
    attribute columns as-is + longitude/latitude from the Point
    geometry (ready for with_geometry / spatial ops)."""
    tables = list_feature_tables(path)
    if not tables:
        raise ValueError(f"no feature tables in {path}")
    if table is None:
        name, geom_col = tables[0]
    else:
        match = [t for t in tables if t[0] == table]
        if not match:
            raise ValueError(f"table {table!r} not in {path} (has {[t for t, _ in tables]})")
        name, geom_col = match[0]

    with sqlite3.connect(path) as con:
        con.row_factory = sqlite3.Row
        rows = con.execute(f'SELECT * FROM "{name}"').fetchall()
    if not rows:
        raise ValueError(f"feature table {name!r} is empty")
    attr_cols = [k for k in rows[0].keys() if k != geom_col]
    data = []
    for r in rows:
        x, y = parse_gpkg_geometry(r[geom_col])
        data.append(tuple(r[c] for c in attr_cols) + (x, y))
    return spark.createDataFrame(data, attr_cols + ["longitude", "latitude"])


def write_point_gpkg(path: str | Path, table: str, rows: list[dict], srs_id: int = 4326):
    """Minimal GeoPackage writer (Point features) — enough for tests
    and small AOI/result exchange; each row dict needs 'longitude' and
    'latitude' plus attribute keys."""
    path = Path(path)
    attr_keys = [k for k in rows[0] if k not in ("longitude", "latitude")]
    with sqlite3.connect(path) as con:
        con.executescript(
            f"""
            PRAGMA application_id = 0x47504B47;
            CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
              srs_name TEXT, srs_id INTEGER PRIMARY KEY, organization TEXT,
              organization_coordsys_id INTEGER, definition TEXT, description TEXT);
            INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES
              ('WGS 84', {srs_id}, 'EPSG', {srs_id}, 'GEOGCS["WGS 84"]', NULL);
            CREATE TABLE IF NOT EXISTS gpkg_contents (
              table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT,
              description TEXT, last_change TEXT, min_x REAL, min_y REAL,
              max_x REAL, max_y REAL, srs_id INTEGER);
            CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
              table_name TEXT PRIMARY KEY, column_name TEXT,
              geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT);
            """
        )
        cols = ", ".join(f'"{k}"' for k in attr_keys)
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" '
            f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, geom BLOB, {cols})"
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents "
            "(table_name, data_type, identifier, srs_id) VALUES (?, 'features', ?, ?)",
            (table, table, srs_id),
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES (?, 'geom', 'POINT', ?, 0, 0)",
            (table, srs_id),
        )
        header = b"GP\x00\x01" + struct.pack("<i", srs_id)  # v1, LE, no envelope
        for r in rows:
            wkb = b"\x01\x01\x00\x00\x00" + struct.pack("<dd", r["longitude"], r["latitude"])
            con.execute(
                f'INSERT INTO "{table}" (geom, {cols}) VALUES (?{", ?" * len(attr_keys)})',
                (header + wkb, *[r[k] for k in attr_keys]),
            )
