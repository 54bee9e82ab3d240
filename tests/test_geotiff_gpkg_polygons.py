"""Pure-stdlib GeoTIFF export and GeoPackage polygon AOI source."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.geo import parse_wkt_rings
from gedixr_spark.operators.joins import spatial_join_aoi
from gedixr_spark.operators.raster import grid_aggregate, grid_to_array, write_geotiff
from gedixr_spark.sources.geopackage import (
    aoi_from_geopackage,
    parse_gpkg_polygon_wkt,
    write_polygon_gpkg,
)
from gedixr_spark.sources.vector import prepare_vec

TIFF_TYPES = {3: ("H", 2), 4: ("I", 4), 12: ("d", 8), 2: ("s", 1)}


def _read_tiff(data: bytes):
    """Minimal TIFF tag reader for assertions."""
    assert data[:4] == b"II\x2a\x00"
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n):
        code, ttype, count, value = struct.unpack_from(
            "<HHII", data, ifd_off + 2 + 12 * i
        )
        fmt, size = TIFF_TYPES[ttype]
        if ttype == 2:
            tags[code] = data[value : value + count].rstrip(b"\x00").decode()
        elif count * size <= 4:
            tags[code] = value
        else:
            tags[code] = struct.unpack_from(f"<{count}{fmt}", data, value)
    return tags


def _shots(spark):
    rows = [
        # (lon, lat, elev): two cells at 1-degree resolution
        (0.25, 9.75, 10.0), (0.75, 9.25, 30.0),  # cell (0,0): avg 20
        (1.5, 9.5, 50.0),                        # cell (0,1)
        (0.5, 8.5, 70.0),                        # cell (1,0)
    ]
    return spark.createDataFrame(rows, "longitude double, latitude double, elev double")


def test_write_geotiff_roundtrip(spark, tmp_path):
    g = grid_aggregate(
        _shots(spark), ["elev"], resolution=(-1.0, 1.0), origin=(0.0, 10.0)
    )
    out = tmp_path / "elev.tif"
    write_geotiff(g, "avg_elev", out, resolution=(-1.0, 1.0), origin=(0.0, 10.0))
    data = out.read_bytes()
    tags = _read_tiff(data)
    assert tags[256] == 2 and tags[257] == 2          # 2x2 raster
    assert tags[258] == 32 and tags[339] == 3          # float32 samples
    assert tags[33550][:2] == (1.0, 1.0)               # pixel scale
    assert tags[33922][3:5] == (0.0, 10.0)             # tiepoint -> origin
    assert tags[42113] == "nan"
    # GeoKeys declare geographic EPSG:4326
    keys = tags[34735]
    kv = {keys[4 + 4 * i]: keys[7 + 4 * i] for i in range((len(keys) - 4) // 4)}
    assert kv[1024] == 2 and kv[2048] == 4326
    # pixel values: strip at StripOffsets, row-major from north
    px = np.frombuffer(data[tags[273] : tags[273] + tags[279]], dtype="<f4").reshape(2, 2)
    assert px[0, 0] == 20.0 and px[0, 1] == 50.0 and px[1, 0] == 70.0
    assert np.isnan(px[1, 1])


def test_grid_to_array_empty_raises(spark):
    g = grid_aggregate(
        _shots(spark).filter(F.col("elev") < 0), ["elev"],
        resolution=(-1.0, 1.0), origin=(0.0, 10.0),
    )
    with pytest.raises(ValueError, match="empty"):
        grid_to_array(g, "avg_elev")


def test_gpkg_polygon_aoi_roundtrip(spark, tmp_path):
    gpkg = tmp_path / "aois.gpkg"
    write_polygon_gpkg(
        gpkg,
        "areas",
        [
            {
                "name": "holed",
                "rings": [
                    [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                    [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]],
                ],
            },
            {"name": "plain", "rings": [[[20, 20], [24, 20], [24, 24], [20, 24], [20, 20]]]},
        ],
    )
    df = aoi_from_geopackage(spark, gpkg)
    rows = {r["aoi_name"]: r["geometry_wkt"] for r in df.collect()}
    assert set(rows) == {"holed", "plain"}
    assert len(parse_wkt_rings(rows["holed"])) == 2
    # engine semantics: hole excluded through the spatial join
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 1.0, 1.0), (3, 21.0, 21.0)],
        "shot int, longitude double, latitude double",
    )
    got = {(r["shot"], r["aoi_name"]) for r in spatial_join_aoi(pts, df).collect()}
    assert got == {(2, "holed"), (3, "plain")}
    # suffix dispatch
    assert {r["aoi_name"] for r in prepare_vec(spark, gpkg).collect()} == {"holed", "plain"}


def test_parse_gpkg_multipolygon(tmp_path):
    # hand-build a GP blob with a MultiPolygon WKB body
    def ring(pts):
        return struct.pack("<I", len(pts)) + b"".join(
            struct.pack("<dd", x, y) for x, y in pts
        )

    sq1 = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    sq2 = [(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]
    poly1 = struct.pack("<BII", 1, 3, 1) + ring(sq1)
    poly2 = struct.pack("<BII", 1, 3, 1) + ring(sq2)
    wkb = struct.pack("<BII", 1, 6, 2) + poly1 + poly2
    blob = b"GP\x00\x01" + struct.pack("<i", 4326) + wkb
    wkt = parse_gpkg_polygon_wkt(blob)
    assert wkt.startswith("MULTIPOLYGON") and len(parse_wkt_rings(wkt)) == 2
