"""F1-F5 boundary tests (SURVEY.md §5.1)."""

import datetime

from gedixr_spark.operators.filters import (
    bbox_filter,
    beam_filter,
    quality_filter,
    resolve_beams,
)
from gedixr_spark.constants import ALL_BEAMS, COVERAGE_BEAMS, POWER_BEAMS


def _shot(spark, **over):
    base = dict(
        quality_flag=1,
        degrade_flag=0,
        num_detectedmodes=2,
        elev=100.0,
        elev_dem_tdx=110.0,
        beam="BEAM0101",
        longitude=0.0,
        latitude=45.0,
    )
    base.update(over)
    return spark.createDataFrame([base])


def test_quality_filter_passes_good_shot(spark):
    out = quality_filter(_shot(spark))
    assert out.count() == 1
    # flags dropped afterwards (reference extract.py:333)
    assert "quality_flag" not in out.columns and "degrade_flag" not in out.columns


def test_quality_filter_boundaries(spark):
    # abs(Δelev) exactly 100 is EXCLUDED (strict <, reference extract.py:331)
    assert quality_filter(_shot(spark, elev_dem_tdx=200.0)).count() == 0
    assert quality_filter(_shot(spark, elev_dem_tdx=199.9999)).count() == 1
    # num_detectedmodes > 0 per the CODE (not the docstring's > 1)
    assert quality_filter(_shot(spark, num_detectedmodes=1)).count() == 1
    assert quality_filter(_shot(spark, num_detectedmodes=0)).count() == 0
    assert quality_filter(_shot(spark, quality_flag=0)).count() == 0
    assert quality_filter(_shot(spark, degrade_flag=1)).count() == 0


def test_resolve_beams_keywords():
    # reference extract.py:112-119
    assert resolve_beams(None) == list(ALL_BEAMS)
    assert resolve_beams("power") == list(POWER_BEAMS)
    assert resolve_beams("coverage") == list(COVERAGE_BEAMS)
    assert resolve_beams(["BEAM0000"]) == ["BEAM0000"]
    assert resolve_beams("BEAM0101") == ["BEAM0101"]


def test_beam_filter(spark):
    df = spark.createDataFrame([(b,) for b in ALL_BEAMS], ["beam"])
    assert beam_filter(df, "power").count() == 4
    assert beam_filter(df, None).count() == 8


def test_bbox_filter_inclusive_edges(spark):
    assert bbox_filter(_shot(spark, longitude=-5.0), -5.0, 40.0, 5.0, 50.0).count() == 1
    assert bbox_filter(_shot(spark, longitude=-5.0001), -5.0, 40.0, 5.0, 50.0).count() == 0
