"""A3 grid-cell aggregation + X11 bounds."""

import pytest

from gedixr_spark.operators.raster import dataset_bounds, grid_aggregate


def _shots(spark):
    rows = [
        # (lon, lat, elev) — two points in one 0.5° cell, one in another
        (0.1, 49.9, 100.0),
        (0.2, 49.8, 200.0),
        (0.9, 49.1, 300.0),
    ]
    return spark.createDataFrame(rows, ["longitude", "latitude", "elev"])


def test_grid_aggregate_avg(spark):
    g = grid_aggregate(
        _shots(spark), ["elev"], resolution=(-0.5, 0.5), origin=(0.0, 50.0), agg="avg"
    )
    cells = {(r["row"], r["col"]): (r["avg_elev"], r["n_shots"]) for r in g.collect()}
    assert cells[(0, 0)] == (150.0, 2)
    assert cells[(1, 1)] == (300.0, 1)


def test_grid_aggregate_auto_origin_and_aggs(spark):
    g = grid_aggregate(_shots(spark), ["elev"], resolution=(-0.5, 0.5), agg="max")
    assert {r["max_elev"] for r in g.collect()} == {200.0, 300.0}
    with pytest.raises(ValueError):
        grid_aggregate(_shots(spark), ["elev"], agg="median")


def test_dataset_bounds(spark):
    assert dataset_bounds(_shots(spark)) == (0.1, 49.1, 0.9, 49.9)
