"""The reference's user extension point: custom variables spec mapping
arbitrary (nested) HDF5 layer paths to output columns
(docs/variables.md:81-86; extract.py:50-53)."""

import numpy as np
import pytest

from gedixr_spark.api import extract_data
from gedixr_spark.constants import effective_schema
from gedixr_spark.testing import FakeGroup, build_opener, make_granule


def test_effective_schema_appends_custom_variables():
    spec = effective_schema("L2A", [("treecover", "land_cover_data/landsat_treecover")])
    assert spec[-1] == ("treecover", "land_cover_data/landsat_treecover")
    assert ("shot", "shot_number") in spec  # base always included (extract.py:124)


def test_extract_with_nested_custom_variable(spark, tmp_path):
    g = make_granule(8, ["BEAM0000"], seed=31)
    # add a nested land-cover group like real granules carry
    g["BEAM0000"]["land_cover_data"] = FakeGroup(
        landsat_treecover=np.linspace(0, 100, 8)
    )
    (tmp_path / "GEDI02_A_2020095010203_O0001_V002.h5").write_bytes(b"")
    opener = build_opener({"GEDI02_A_2020095010203_O0001_V002.h5": g})
    df, _ = extract_data(
        spark,
        tmp_path,
        gedi_product="L2A",
        variables=[("rh98", "rh98"), ("treecover", "land_cover_data/landsat_treecover")],
        apply_quality_filter=False,
        save=False,
        granule_opener=opener,
    )
    rows = df.collect()
    assert "treecover" in df.columns
    assert {round(r["treecover"], 3) for r in rows} == {
        round(v, 3) for v in np.linspace(0, 100, 8)
    }


def test_custom_output_name_for_rh_layer(spark, tmp_path):
    """ADVICE r1: a custom mapping ('canopy98','rh98') must hit the
    rh-array branch (keyed on the SOURCE layer name, reference
    extract.py:281) instead of KeyError-ing into the corrupt-granule
    handler and silently yielding zero rows."""
    g = make_granule(6, ["BEAM0000"], seed=33)
    (tmp_path / "GEDI02_A_2020095010203_O0001_V002.h5").write_bytes(b"")
    opener = build_opener({"GEDI02_A_2020095010203_O0001_V002.h5": g})
    df, _ = extract_data(
        spark,
        tmp_path,
        gedi_product="L2A",
        variables=[("canopy98", "rh98")],
        apply_quality_filter=False,
        save=False,
        granule_opener=opener,
    )
    rows = df.collect()
    assert len(rows) == 6 and "canopy98" in df.columns
    expected = np.rint(np.asarray(g["BEAM0000"]["rh"])[:, 98] * 100).astype(int)
    assert sorted(r["canopy98"] for r in rows) == sorted(int(v) for v in expected)


def test_missing_layer_raises_schema_error(spark, tmp_path):
    """A misconfigured variables spec FAILS the job (GranuleSchemaError)
    rather than being absorbed as a corrupt granule."""
    import py4j.protocol

    g = make_granule(4, ["BEAM0000"], seed=34)
    (tmp_path / "GEDI02_A_2020095010203_O0001_V002.h5").write_bytes(b"")
    opener = build_opener({"GEDI02_A_2020095010203_O0001_V002.h5": g})
    with pytest.raises(Exception) as exc_info:
        df, _ = extract_data(
            spark,
            tmp_path,
            gedi_product="L2A",
            variables=[("nope", "no_such_layer")],
            apply_quality_filter=False,
            save=False,
            granule_opener=opener,
        )
        df.collect()
    assert "GranuleSchemaError" in str(exc_info.value) or "no_such_layer" in str(
        exc_info.value
    )


def test_extract_counts_corrupt_granules(spark, tmp_path):
    from gedixr_spark.operators.stats import error_accumulator

    names = {
        "GEDI02_A_2020095010203_O0001_V002.h5": make_granule(5, ["BEAM0000"], seed=32),
    }
    (tmp_path / "GEDI02_A_2020095010203_O0001_V002.h5").write_bytes(b"")
    (tmp_path / "GEDI02_A_2020200000000_corrupt_V002.h5").write_bytes(b"")
    acc = error_accumulator(spark)
    df, _ = extract_data(
        spark, tmp_path, gedi_product="L2A", save=False,
        apply_quality_filter=False, granule_opener=build_opener(names), error_acc=acc,
    )
    assert df.count() == 5
    assert acc.value == 1  # the corrupt granule was counted, not fatal
