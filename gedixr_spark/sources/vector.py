"""S6 — AOI vector source (SURVEY.md §2.1 S6).

The reference's ``prepare_vec`` (ancillary.py:121-154) reads any
fiona-supported vector file, reprojects to EPSG:4326, and explodes
multi-feature files into named single geometries keyed ``{base}_{i}``.

Here the AOI table is a small driver-side collection → a DataFrame
``(aoi_name, geometry_wkt)`` that downstream joins broadcast. Supported
inputs without geo libs: WKT strings, GeoJSON files (pure json), and
(import-gated) anything fiona reads.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from gedixr_spark.geo import parse_wkt_polygon  # validation only

AOI_COLUMNS = ("aoi_name", "geometry_wkt")


def _ring_to_wkt(ring: list[list[float]]) -> str:
    body = ", ".join(f"{x} {y}" for x, y in ring)
    return f"POLYGON (({body}))"


def aoi_from_wkt(spark: SparkSession, aois: dict[str, str]) -> DataFrame:
    """Build the AOI table from ``{name: wkt_polygon}``; validates each
    polygon parses. Mirrors prepare_vec's output structure
    (extract.py:78-83) with the dict flattened to an ``aoi_name`` column."""
    for name, wkt in aois.items():
        parse_wkt_polygon(wkt)
    return spark.createDataFrame(
        list(aois.items()), schema="aoi_name string, geometry_wkt string"
    )


def aoi_from_geojson(spark: SparkSession, path: str | Path) -> DataFrame:
    """GeoJSON AOI reader (pure-json subset of prepare_vec). Multi-feature
    files explode to ``{stem}_{i}`` names exactly like the reference
    (ancillary.py:148-153); single-feature files use the stem alone.
    Only Polygon geometry (exterior ring) is supported — matching the
    reference's named-polygon AOI model. Assumes EPSG:4326 input; CRS
    transforms need geo libs (import-gated upstream)."""
    path = Path(path)
    doc = json.loads(path.read_text())
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    base = path.stem
    rows = []
    for i, feat in enumerate(feats):
        geom = feat["geometry"] if "geometry" in feat else feat
        if geom["type"] != "Polygon":
            raise ValueError(f"only Polygon AOIs supported, got {geom['type']}")
        name = base if len(feats) == 1 else f"{base}_{i}"
        rows.append((name, _ring_to_wkt(geom["coordinates"][0])))
    return spark.createDataFrame(rows, schema=list(AOI_COLUMNS))


def prepare_vec(spark: SparkSession, vec) -> DataFrame:
    """Dispatch like the reference's prepare_vec: dict of WKT, a GeoJSON
    path, or a list of either — unioned into one AOI table."""
    if isinstance(vec, dict):
        return aoi_from_wkt(spark, vec)
    if isinstance(vec, (str, Path)):
        return aoi_from_geojson(spark, vec)
    out = None
    for v in vec:
        df = prepare_vec(spark, v)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError("empty AOI input")
    return out
