"""CRS transforms (web mercator) + skew utilities."""

import math

import pytest
from pyspark.sql import functions as F

from gedixr_spark.geo import (
    st_transform,
    st_transform_3857_to_4326,
    st_transform_4326_to_3857,
)
from gedixr_spark.operators.skew import key_histogram, salted_agg, salted_join


def test_web_mercator_known_points(spark):
    df = spark.createDataFrame([(0.0, 0.0), (180.0, 0.0), (10.0, 50.0)], ["lon", "lat"])
    x, y = st_transform_4326_to_3857(F.col("lon"), F.col("lat"))
    rows = df.select(x.alias("x"), y.alias("y")).collect()
    assert rows[0]["x"] == 0.0 and abs(rows[0]["y"]) < 1e-9
    assert abs(rows[1]["x"] - 20037508.342789244) < 1e-6  # half circumference
    assert abs(rows[2]["x"] - 1113194.9079327357) < 1e-6
    assert abs(rows[2]["y"] - 6446275.841017158) < 1e-6


def test_web_mercator_clamps_poles(spark):
    df = spark.createDataFrame([(0.0, 90.0), (0.0, -90.0)], ["lon", "lat"])
    x, y = st_transform_4326_to_3857(F.col("lon"), F.col("lat"))
    rows = df.select(y.alias("y")).collect()
    # clamped to the ±85.0511° square-world bound, never ±inf
    assert abs(abs(rows[0]["y"]) - 20037508.342789244) < 1e-6
    assert abs(abs(rows[1]["y"]) - 20037508.342789244) < 1e-6


def test_web_mercator_roundtrip(spark):
    df = spark.createDataFrame([(-73.99, 40.73), (139.69, 35.68)], ["lon", "lat"])
    x, y = st_transform_4326_to_3857(F.col("lon"), F.col("lat"))
    lon2, lat2 = st_transform_3857_to_4326(x, y)
    rows = df.select(lon2.alias("lon2"), lat2.alias("lat2"), "lon", "lat").collect()
    for r in rows:
        assert math.isclose(r["lon2"], r["lon"], abs_tol=1e-9)
        assert math.isclose(r["lat2"], r["lat"], abs_tol=1e-9)


def test_st_transform_dispatch(spark):
    df = spark.createDataFrame([(10.0, 50.0)], ["longitude", "latitude"])
    out = st_transform(df, "longitude", "latitude", "EPSG:4326", "EPSG:3857")
    assert {"x_3857", "y_3857"} <= set(out.columns)
    # UTM is now built in (see test_utm.py); a conic CRS still needs pyproj
    with pytest.raises(NotImplementedError):
        st_transform(df, "longitude", "latitude", "EPSG:4326", "EPSG:2154")


def _skewed(spark):
    # key 'hot' has 900 rows, others 10 each
    rows = [("hot", float(i % 7)) for i in range(900)]
    rows += [(f"k{j}", float(j)) for j in range(10) for _ in range(10)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert math.isclose(plain[k][1], salted[k][1], rel_tol=1e-9)
        assert plain[k][2:] == salted[k][2:]


def test_salted_agg_rejects_nonsplittable(spark):
    with pytest.raises(ValueError):
        salted_agg(_skewed(spark), ["k"], {"a": ("avg", "v")})


def test_salted_join_matches_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H"), ("k1", "A"), ("k2", "B")], ["k", "label"])
    plain = sorted((r["k"], r["label"]) for r in fact.join(dim, "k").collect())
    salted = sorted((r["k"], r["label"]) for r in salted_join(fact, dim, "k").collect())
    assert plain == salted


def test_key_histogram_orders_by_count(spark):
    top = key_histogram(_skewed(spark), "k", top=3).collect()
    assert top[0]["k"] == "hot" and top[0]["n_rows"] == 900
