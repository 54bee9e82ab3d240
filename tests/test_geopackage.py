"""GeoPackage source (stdlib sqlite3 + GeoPackage Binary) — the S5
.gpkg path, previously stubbed."""

import pytest

from gedixr_spark.sources.geopackage import (
    list_feature_tables,
    parse_gpkg_geometry,
    read_geopackage,
    write_point_gpkg,
)
from gedixr_spark.sources.shots import read_shots

ROWS = [
    {"shot": "000000000000000001", "rh98": 123, "longitude": 10.5, "latitude": 50.25},
    {"shot": "000000000000000002", "rh98": 456, "longitude": -3.75, "latitude": 44.0},
]


@pytest.fixture()
def gpkg(tmp_path):
    p = tmp_path / "shots.gpkg"
    write_point_gpkg(p, "shots", ROWS)
    return p


def test_roundtrip_read(spark, gpkg):
    assert list_feature_tables(gpkg) == [("shots", "geom")]
    df = read_geopackage(spark, gpkg)
    got = {r["shot"]: (r["longitude"], r["latitude"], r["rh98"]) for r in df.collect()}
    assert got["000000000000000001"] == (10.5, 50.25, 123)
    assert got["000000000000000002"] == (-3.75, 44.0, 456)


def test_read_shots_dispatches_on_gpkg_suffix(spark, gpkg):
    # reference xr.py:48-53 suffix dispatch, now a working path
    df = read_shots(spark, str(gpkg))
    assert df.count() == 2 and "longitude" in df.columns


def test_bad_table_and_bad_blob_errors(spark, gpkg):
    with pytest.raises(ValueError, match="not in"):
        read_geopackage(spark, gpkg, table="nope")
    with pytest.raises(ValueError, match="GP magic"):
        parse_gpkg_geometry(b"XX\x00\x01" + b"\x00" * 25)


def test_non_point_geometry_rejected():
    import struct

    header = b"GP\x00\x01" + struct.pack("<i", 4326)
    polygon_wkb = b"\x01\x03\x00\x00\x00" + b"\x00" * 16
    with pytest.raises(ValueError, match="only Point"):
        parse_gpkg_geometry(header + polygon_wkb)
