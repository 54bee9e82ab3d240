"""L2B reader path: nested geolocation/ layer paths + l2b_quality_flag
(reference constants.py:29-37) through the real mapInPandas plumbing."""

import pytest

from gedixr_spark.api import extract_data
from gedixr_spark.constants import effective_schema
from gedixr_spark.sources.hdf5 import discover_granules, read_granules
from gedixr_spark.testing import build_opener, make_granule


@pytest.fixture(scope="module")
def l2b_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("l2b")
    names = {
        "GEDI02_B_2020095010203_O0001_V002.h5": make_granule(
            6, ["BEAM0000", "BEAM1011"], seed=21, product="L2B"
        ),
    }
    for n in names:
        (d / n).write_bytes(b"")
    return d, build_opener(names)


def test_l2b_nested_layers_resolve(spark, l2b_env):
    d, opener = l2b_env
    inv = discover_granules(spark, d, "L2B")
    df = read_granules(inv, "L2B", effective_schema("L2B"), granule_opener=opener)
    rows = df.collect()
    assert len(rows) == 12
    # nested geolocation/* layers landed in flat output columns
    assert all(40 <= r["latitude"] <= 55 for r in rows)
    # L2B default variables present (constants.py:14-17 renames)
    assert {"tcc", "fhd", "pai", "rh100"} <= set(df.columns)
    assert all(0 <= r["tcc"] <= 1 for r in rows)


def test_l2b_extract_data_end_to_end(spark, l2b_env, tmp_path):
    d, opener = l2b_env
    df, out = extract_data(
        spark, d, gedi_product="L2B", output_dir=tmp_path, granule_opener=opener
    )
    assert df.count() > 0
    assert "_L2B_QF" in out
