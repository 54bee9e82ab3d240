"""Minimal geospatial layer (no Sedona/shapely available in this env).

Representation choice: a point geometry is a ``struct<x:double, y:double>``
column. Unlike opaque WKB bytes, a struct
- is a valid shuffle/join key (the reference joins on geometry,
  xr.py:84-86),
- keeps coordinate access inside whole-stage codegen (no decode UDF on
  the hot path),
- converts to/from WKB only at the GeoParquet boundary via
  Arrow-vectorized pandas UDFs.

Spatial predicates: axis-aligned rectangles (the oracle-expressible
case, FIXTURES.md §3) compile to range predicates that push into the
scan; arbitrary polygons use a numpy ray-casting pandas UDF behind a
bbox prefilter — the same coarse-then-exact strategy the reference uses
(bbox at download, exact intersects at extraction; SURVEY §4).
"""

from __future__ import annotations

import math
import re
import struct as _struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType

POINT_FIELDS = ("x", "y")


def st_point(lon: Column, lat: Column) -> Column:
    """Point constructor (X8; reference extract.py:167 ``Point(x, y)``)."""
    return F.struct(lon.alias("x"), lat.alias("y"))


def st_x(geom: Column | str) -> Column:
    g = F.col(geom) if isinstance(geom, str) else geom
    return g.getField("x")


def st_y(geom: Column | str) -> Column:
    g = F.col(geom) if isinstance(geom, str) else geom
    return g.getField("y")


# --- WKB boundary (sink/source only; never in the relational hot path) ---

_WKB_POINT_LE = b"\x01\x01\x00\x00\x00"


@pandas_udf(BinaryType())
def point_struct_to_wkb(geom: pd.DataFrame) -> pd.Series:
    """struct<x,y> → little-endian WKB Point bytes (GeoParquet geometry)."""
    x = geom["x"].to_numpy(dtype=np.float64)
    y = geom["y"].to_numpy(dtype=np.float64)
    pack = _struct.Struct("<dd").pack
    return pd.Series([_WKB_POINT_LE + pack(a, b) for a, b in zip(x, y)])


def wkb_point_xy(wkb: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Decode little-endian WKB Point bytes to (x, y) arrays."""
    buf = np.frombuffer(b"".join(wkb.to_numpy()), dtype=np.uint8)
    rec = buf.reshape(len(wkb), 21)  # 1 byte order + 4 type + 16 coords
    coords = rec[:, 5:].copy().view(np.float64).reshape(len(wkb), 2)
    return coords[:, 0], coords[:, 1]


# --- Polygons (driver-side values; broadcast as literals/UDF closures) ---

_WKT_POLYGON_RE = re.compile(r"^\s*POLYGON\s*\(\((.*)\)\)\s*$", re.IGNORECASE | re.DOTALL)


def parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    """Parse a single-ring WKT POLYGON into a vertex list (closed ring).

    Covers the reference's AOI inputs (ancillary.py:121-154 reads vector
    files into polygons); interior rings are not supported — multi-ring
    AOIs should be exploded upstream like the reference explodes
    multi-feature files (ancillary.py:148-153).
    """
    m = _WKT_POLYGON_RE.match(wkt)
    if not m or ")" in m.group(1):
        raise ValueError(f"unsupported WKT (single-ring POLYGON only): {wkt[:60]}...")
    verts = []
    for pair in m.group(1).split(","):
        xs, ys = pair.split()
        verts.append((float(xs), float(ys)))
    if verts[0] != verts[-1]:
        verts.append(verts[0])
    return verts


def polygon_bounds(verts: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    xs = [v[0] for v in verts]
    ys = [v[1] for v in verts]
    return min(xs), min(ys), max(xs), max(ys)


def is_rectangle(verts: list[tuple[float, float]]) -> bool:
    """True if the ring is an axis-aligned rectangle — the fast path that
    compiles to pushdown-able range predicates."""
    ring = verts[:-1]
    if len(ring) != 4:
        return False
    xmin, ymin, xmax, ymax = polygon_bounds(verts)
    corners = {(xmin, ymin), (xmin, ymax), (xmax, ymin), (xmax, ymax)}
    return set(ring) == corners and not math.isclose(xmin, xmax) and not math.isclose(ymin, ymax)


def st_intersects_polygon(lon: Column, lat: Column, wkt: str) -> Column:
    """X9 — ``point.intersects(polygon)`` as a Column predicate.

    Rectangles → pure range predicates (pushed to the scan). General
    polygons → bbox prefilter AND a vectorized ray-casting pandas UDF;
    boundary points count as inside (matching shapely ``intersects``).
    """
    verts = parse_wkt_polygon(wkt)
    xmin, ymin, xmax, ymax = polygon_bounds(verts)
    bbox = lon.between(xmin, xmax) & lat.between(ymin, ymax)
    if is_rectangle(verts):
        return bbox

    vx = np.array([v[0] for v in verts], dtype=np.float64)
    vy = np.array([v[1] for v in verts], dtype=np.float64)

    @pandas_udf(BooleanType())
    def _pip(px: pd.Series, py: pd.Series) -> pd.Series:
        x = px.to_numpy(dtype=np.float64)[:, None]
        y = py.to_numpy(dtype=np.float64)[:, None]
        x1, y1 = vx[None, :-1], vy[None, :-1]
        x2, y2 = vx[None, 1:], vy[None, 1:]
        # ray casting: count edges crossing the upward ray from (x, y)
        cond = (y1 <= y) != (y2 <= y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
        crossings = (cond & (x < xint)).sum(axis=1)
        inside = (crossings % 2) == 1
        # boundary: a point on an edge segment counts as inside (shapely
        # `intersects` semantics). Tolerance 1e-9: far above fp noise
        # (~1e-13 at degree scale), far below any genuine offset.
        dx, dy = x2 - x1, y2 - y1
        cross = (x - x1) * dy - (y - y1) * dx
        t = ((x - x1) * dx + (y - y1) * dy) / (dx * dx + dy * dy)
        on_edge = ((np.abs(cross) < 1e-9) & (t >= 0) & (t <= 1)).any(axis=1)
        return pd.Series(inside | on_edge)

    return bbox & _pip(lon, lat)
