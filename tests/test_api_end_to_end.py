"""End-to-end golden pipeline test (SURVEY.md §5.3): fake granules →
extract → quality filter → AOI subset → GeoParquet, plus property checks
(§5.4)."""

import pytest
from pyspark.sql import functions as F

from gedixr_spark.api import extract_data
from gedixr_spark.operators.filters import quality_filter

from gedixr_spark.testing import build_opener, make_granule


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    names = {
        "GEDI02_A_2020095010203_O0001_V002.h5": make_granule(50, ["BEAM0000", "BEAM0101"], seed=11),
        "GEDI02_A_2020200120000_O0002_V002.h5": make_granule(30, ["BEAM1000"], seed=12),
    }
    for n in names:
        (d / n).write_bytes(b"")
    return d, build_opener(names)


def test_extract_data_end_to_end(spark, env, tmp_path):
    d, opener = env
    df, out_path = extract_data(
        spark,
        d,
        gedi_product="L2A",
        subset_vector={"west": "POLYGON ((-10 40, 0 40, 0 55, -10 55, -10 40))",
                       "east": "POLYGON ((0 40, 10 40, 10 55, 0 55, 0 40))"},
        output_dir=tmp_path,
        granule_opener=opener,
    )
    rows = df.collect()
    assert rows, "quality-filtered extraction should keep rows"
    assert {"shot", "beam", "acq_time", "geometry", "aoi_name", "rh98"} <= set(df.columns)
    # quality flags dropped (extract.py:333); lat/lon dropped (extract.py:169)
    assert "quality_flag" not in df.columns and "longitude" not in df.columns
    assert out_path and "_L2A_QF" in out_path
    back = spark.read.parquet(out_path)
    assert back.count() == len(rows)
    assert (tmp_path / "extracted").exists()


def test_extract_data_rejects_bad_product(spark, env):
    d, opener = env
    with pytest.raises(ValueError):
        extract_data(spark, d, gedi_product="L3X", granule_opener=opener)


def test_quality_filter_is_subset_property(spark, env):
    """Property: quality-filter output ⊆ input (SURVEY §5.4)."""
    d, opener = env
    df, _ = extract_data(spark, d, gedi_product="L2A", apply_quality_filter=False,
                         save=False, granule_opener=opener)
    filtered = quality_filter(df)
    assert filtered.count() <= df.count()
    assert filtered.join(df, on="shot", how="left_anti").count() == 0


def test_extract_data_zorder_save(spark, env, tmp_path):
    """zorder=True flows through to the sink and derives the Morton key
    from the geometry struct (lat/lon are dropped pre-save)."""
    d, opener = env
    df, out_path = extract_data(
        spark,
        d,
        gedi_product="L2A",
        output_dir=tmp_path,
        granule_opener=opener,
        zorder=True,
        zorder_files=2,
    )
    back = spark.read.parquet(out_path)
    assert back.count() == df.count() > 0
    assert "__z" not in back.columns
