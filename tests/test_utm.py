"""Column-math UTM (Krüger series) — independent numeric checks, not
a replay of the same series."""

import math

import numpy as np
from pyspark.sql import functions as F

from gedixr_spark.geo import (
    st_transform,
    st_transform_4326_to_utm,
    st_transform_utm_to_4326,
    utm_zone,
)

_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)


def _meridian_arc(lat_deg: float) -> float:
    """Independent meridian distance: numeric integral of the meridian
    radius of curvature M(φ) = a(1-e²)/(1-e²sin²φ)^{3/2}."""
    phi = np.linspace(0.0, math.radians(lat_deg), 200_001)
    m = _A * (1 - _E2) / np.power(1 - _E2 * np.sin(phi) ** 2, 1.5)
    return float(((m[:-1] + m[1:]) / 2 * np.diff(phi)).sum())


def test_utm_zone():
    assert utm_zone(-180.0) == 1
    assert utm_zone(0.0) == 31
    assert utm_zone(177.0) == 60
    assert utm_zone(11.5) == 32


def _fwd(spark, pts, zone, north=True):
    df = spark.createDataFrame(pts, "lon double, lat double")
    e, n = st_transform_4326_to_utm(F.col("lon"), F.col("lat"), zone, north)
    return df.select(e.alias("e"), n.alias("n")).collect()


def test_central_meridian_easting_and_scaled_arc(spark):
    # zone 32 central meridian = 9°E: easting == 500000 exactly, and
    # northing == 0.9996 x meridian arc (checked against an independent
    # numeric integration, tolerance 1 mm)
    for lat in (0.0, 12.5, 45.0, 51.6):
        [r] = _fwd(spark, [(9.0, lat)], 32)
        assert abs(r["e"] - 500_000.0) < 1e-6
        assert abs(r["n"] - 0.9996 * _meridian_arc(lat)) < 1e-3


def test_utm_roundtrip_and_symmetry(spark):
    pts = [(6.5, 47.3), (11.9, 40.0), (9.0, -33.0), (7.25, 0.01)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    e, n = st_transform_4326_to_utm(F.col("lon"), F.col("lat"), 32, north=True)
    back_lon, back_lat = st_transform_utm_to_4326(e, n, 32, north=True)
    rows = df.select(
        "lon", "lat", back_lon.alias("lon2"), back_lat.alias("lat2"), e.alias("e")
    ).collect()
    for r in rows:
        assert abs(r["lon"] - r["lon2"]) < 1e-9
        assert abs(r["lat"] - r["lat2"]) < 1e-9
    # mirror symmetry about the central meridian: easting(9+d) - 500k
    # == 500k - easting(9-d)
    [a] = _fwd(spark, [(9.0 + 2.0, 45.0)], 32)
    [b] = _fwd(spark, [(9.0 - 2.0, 45.0)], 32)
    assert abs((a["e"] - 500_000.0) + (b["e"] - 500_000.0)) < 1e-6


def test_southern_hemisphere_false_northing(spark):
    [r] = _fwd(spark, [(9.0, -10.0)], 32, north=False)
    assert abs(r["n"] - (10_000_000.0 - 0.9996 * _meridian_arc(10.0))) < 1e-3


def test_st_transform_dispatch_utm(spark):
    df = spark.createDataFrame([(9.5, 48.0)], "longitude double, latitude double")
    out = st_transform(df, "longitude", "latitude", "EPSG:4326", "EPSG:32632")
    r = out.collect()[0]
    assert 500_000.0 < r["easting"] < 600_000.0 and r["northing"] > 5_000_000.0
    back = st_transform(
        out.select(F.col("easting").alias("e"), F.col("northing").alias("n")),
        "e", "n", "EPSG:32632", "EPSG:4326",
    ).collect()[0]
    assert abs(back["longitude"] - 9.5) < 1e-9 and abs(back["latitude"] - 48.0) < 1e-9


def test_utm_plan_stays_in_codegen(spark):
    """No UDF nodes: the whole transform is built-in column math."""
    df = spark.createDataFrame([(9.5, 48.0)], "lon double, lat double")
    e, n = st_transform_4326_to_utm(F.col("lon"), F.col("lat"), 32)
    plan = df.select(e.alias("e"), n.alias("n"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_auto_zone_matches_fixed_zone(spark):
    from gedixr_spark.geo import st_transform_4326_to_utm_auto

    pts = [(7.5, 48.0), (9.0, 45.0), (11.99, 51.0),   # zone 32 north
           (8.0, -20.0),                               # zone 32 south
           (13.0, 48.0)]                               # zone 33
    df = spark.createDataFrame(pts, "lon double, lat double")
    z, e, n = st_transform_4326_to_utm_auto(F.col("lon"), F.col("lat"))
    rows = df.select("lon", "lat", z, e.alias("e"), n.alias("n")).collect()
    for r in rows:
        zone = r["utm_zone"]
        assert zone == utm_zone(r["lon"])
        ef, nf = st_transform_4326_to_utm(
            F.col("lon"), F.col("lat"), zone, north=r["lat"] >= 0
        )
        [fixed] = (
            spark.createDataFrame([(r["lon"], r["lat"])], "lon double, lat double")
            .select(ef.alias("e"), nf.alias("n"))
            .collect()
        )
        assert abs(r["e"] - fixed["e"]) < 1e-6 and abs(r["n"] - fixed["n"]) < 1e-6
