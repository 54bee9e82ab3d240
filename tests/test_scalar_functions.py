"""Unit tests for the X1-X7 scalar surface (SURVEY.md §5.1 strategy)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from gedixr_spark.functions.scalar import (
    acq_time_from_filename,
    month_band,
    rh_percentile,
    shot_id_str,
)


def test_acq_time_from_filename_parses_day_of_year(spark):
    # reference extract.py:232-236: 2020 day 095 = 2020-04-04
    df = spark.createDataFrame(
        [("GEDI02_B_2020095010203_O07292_02_T03559_02_003_01_V002.h5",),
         ("not_a_granule.h5",)],
        ["file_name"],
    )
    out = df.select(acq_time_from_filename("file_name").alias("ts")).collect()
    assert out[0]["ts"] == datetime.datetime(2020, 4, 4, 1, 2, 3)
    assert out[1]["ts"] is None


def test_rh_percentile_is_zero_based_and_cm_rounded(spark):
    # reference extract.py:281-286: rh[98] (0-based), m→cm, rounded int
    rh = [i / 10.0 for i in range(101)]  # rh[98] = 9.8 m
    df = spark.createDataFrame([Row(rh=rh)])
    out = df.select(rh_percentile("rh", 98).alias("v")).first()
    assert out["v"] == 980
    out0 = df.select(rh_percentile("rh", 0).alias("v")).first()
    assert out0["v"] == 0
    out100 = df.select(rh_percentile("rh", 100).alias("v")).first()
    assert out100["v"] == 1000


def test_shot_id_str_pads_to_18(spark):
    df = spark.createDataFrame([(123,)], ["shot_number"])
    assert df.select(shot_id_str("shot_number").alias("s")).first()["s"] == "0" * 15 + "123"


def test_month_band_inclusive_and_swapped(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2020, m, 15),) for m in range(1, 13)], ["ts"]
    )
    kept = df.filter(month_band("ts", 6, 8)).count()
    assert kept == 3  # inclusive ends
    # reversed bounds swap (reference extract.py:139-140)
    kept_rev = df.filter(month_band("ts", 8, 6)).count()
    assert kept_rev == 3
