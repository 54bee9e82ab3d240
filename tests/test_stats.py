"""A1/A2 stats operators: observe-based global stats + per-file stats."""

from pyspark.sql import functions as F

from gedixr_spark.operators.stats import filter_stats_per_file, observe_filter_stats


def _shots(spark):
    rows = [
        # (file, quality, degrade, modes, elev, dem)
        ("f1", 1, 0, 2, 100.0, 120.0),   # pass
        ("f1", 0, 0, 2, 100.0, 120.0),   # fail quality
        ("f2", 1, 0, 2, 100.0, 300.0),   # fail elev
        ("f2", 1, 0, 2, 100.0, 100.0),   # pass
    ]
    return spark.createDataFrame(
        rows,
        ["source_file", "quality_flag", "degrade_flag", "num_detectedmodes", "elev", "elev_dem_tdx"],
    )


def test_filter_stats_per_file(spark):
    out = {r["source_file"]: r for r in filter_stats_per_file(_shots(spark)).collect()}
    assert out["f1"]["total"] == 2 and out["f1"]["passed"] == 1
    assert out["f1"]["pct_filtered"] == 50.0
    assert out["f2"]["filtered"] == 1


def test_observe_filter_stats_piggybacks_on_action(spark):
    df, obs = observe_filter_stats(_shots(spark))
    df.count()  # one action, no extra scan
    got = obs.get
    assert got["total"] == 4 and got["passed"] == 2
