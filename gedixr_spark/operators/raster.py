"""A3 — rasterization as grid-cell aggregation (SURVEY.md §2.5).

The reference's ``gdf_to_xr`` (xr.py:144-174) bins point shots onto a
regular lon/lat grid via geocube, whose rasterize default is
last-value-wins — nondeterministic under parallelism. Per SURVEY §7.3 we
define deterministic cell aggregation instead (avg/min/max/count/first
by explicit order), as a plain groupBy: one shuffle keyed by cell id,
map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gedixr_spark.constants import DEFAULT_RASTER_RESOLUTION

_AGGS = {
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "sum": F.sum,
}


def grid_aggregate(
    df: DataFrame,
    measurements: list[str],
    resolution: tuple[float, float] = DEFAULT_RASTER_RESOLUTION,
    origin: tuple[float, float] | None = None,
    agg: str = "avg",
    lon_col: str = "longitude",
    lat_col: str = "latitude",
) -> DataFrame:
    """Bin shots into grid cells of ``resolution`` (res_y, res_x) degrees
    — default (-0.0003, 0.0003) ≈ 30 m, reference xr.py:168-169 — and
    aggregate each measurement per cell.

    Cell ids are ``row = floor((y0 - lat)/|res_y|)``,
    ``col = floor((lon - x0)/res_x)`` with the origin at the data's
    (min x, max y) corner unless given — matching raster row-major
    orientation (row 0 = northmost), while staying a pure hash
    aggregation that scales linearly.
    """
    res_y, res_x = resolution
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    if origin is None:
        b = df.agg(F.min(lon_col).alias("x0"), F.max(lat_col).alias("y0")).first()
        origin = (b["x0"], b["y0"])
    x0, y0 = origin
    row = F.floor((F.lit(y0) - F.col(lat_col)) / abs(res_y)).alias("row")
    col = F.floor((F.col(lon_col) - F.lit(x0)) / res_x).alias("col")
    fn = _AGGS[agg]
    return df.groupBy(row, col).agg(
        *[fn(m).alias(f"{agg}_{m}") for m in measurements],
        F.count(F.lit(1)).alias("n_shots"),
    )


def dataset_bounds(
    df: DataFrame, lon_col: str = "longitude", lat_col: str = "latitude"
) -> tuple[float, float, float, float]:
    """X11 — bbox of a geometry set (reference ``total_bounds``,
    download.py:232-233) as a single min/max aggregation."""
    r = df.agg(
        F.min(lon_col).alias("xmin"),
        F.min(lat_col).alias("ymin"),
        F.max(lon_col).alias("xmax"),
        F.max(lat_col).alias("ymax"),
    ).first()
    return r["xmin"], r["ymin"], r["xmax"], r["ymax"]


def to_xarray(grid_df: DataFrame, value_cols: list[str]):
    """Driver-side export of a (small, already-aggregated) grid to an
    xarray.Dataset — the reference's return type (xr.py:170-173).
    Import-gated: xarray isn't in this environment."""
    try:
        import xarray as xr  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "xarray not available in this environment; the aggregated grid "
            "DataFrame is the supported output"
        ) from e
    import numpy as np

    pdf = grid_df.toPandas()
    nrow, ncol = int(pdf["row"].max()) + 1, int(pdf["col"].max()) + 1
    data = {}
    for v in value_cols:
        arr = np.full((nrow, ncol), np.nan)
        arr[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf[v].to_numpy()
        data[v] = (("y", "x"), arr)
    return xr.Dataset(data)
