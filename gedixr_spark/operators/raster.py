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


def grid_to_array(grid_df: DataFrame, value_col: str):
    """Driver-side densify of an aggregated (row, col, value) grid into
    a 2-D float64 numpy array (NaN where no cell) — the raster shape
    shared by the xarray and GeoTIFF exports. The grid is already
    aggregated (cells, not shots), so collecting it is O(raster size)."""
    import numpy as np

    pdf = grid_df.select("row", "col", value_col).toPandas()
    if len(pdf) == 0:
        raise ValueError("empty grid")
    if (pdf["row"] < 0).any() or (pdf["col"] < 0).any():
        raise ValueError("negative cell ids — pass the data bounds as origin")
    nrow, ncol = int(pdf["row"].max()) + 1, int(pdf["col"].max()) + 1
    arr = np.full((nrow, ncol), np.nan)
    arr[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf[value_col].to_numpy(
        dtype=np.float64
    )
    return arr


def write_geotiff(
    grid_df: DataFrame,
    value_col: str,
    path,
    resolution: tuple[float, float] = DEFAULT_RASTER_RESOLUTION,
    origin: tuple[float, float] = (0.0, 0.0),
) -> str:
    """Export an aggregated grid to a single-band float32 GeoTIFF —
    pure stdlib ``struct`` + numpy, no rasterio/GDAL needed (replaces
    the reference's geocube→xarray export path, xr.py:170-173, with a
    COG-style georeferenced artifact any GIS tool reads).

    File layout (public TIFF 6.0 + GeoTIFF 1.1 specs): little-endian
    classic TIFF, one strip, uncompressed IEEE float32 samples,
    georeferencing via ModelPixelScale + one ModelTiepoint (raster
    (0,0) ↦ the ``origin`` = (x0, y0) upper-left corner used by
    ``grid_aggregate``) and a GeoKey directory declaring geographic
    WGS84 (EPSG:4326), PixelIsArea. NaN marks empty cells and is
    declared via the GDAL_NODATA ASCII tag."""
    import struct as _s

    import numpy as np

    arr = grid_to_array(grid_df, value_col).astype("<f4")
    nrow, ncol = arr.shape
    res_y, res_x = resolution
    x0, y0 = origin

    data = arr.tobytes()  # row-major, row 0 = northmost (grid_aggregate)
    # --- out-of-line tag payloads, placed after the 8-byte header ---
    payload_off = 8
    pixel_scale = _s.pack("<3d", abs(res_x), abs(res_y), 0.0)
    tiepoint = _s.pack("<6d", 0.0, 0.0, 0.0, x0, y0, 0.0)
    # GeoKeys: version 1.1.0; ModelType=2 (geographic), RasterType=1
    # (PixelIsArea), GeographicType=4326
    geokeys = _s.pack(
        "<16H",
        1, 1, 0, 3,
        1024, 0, 1, 2,
        1025, 0, 1, 1,
        2048, 0, 1, 4326,
    )
    nodata = b"nan\x00"
    blocks = {}
    off = payload_off
    for name, b in (
        ("scale", pixel_scale),
        ("tie", tiepoint),
        ("keys", geokeys),
        ("nodata", nodata),
        ("strip", data),
    ):
        blocks[name] = off
        off += len(b) + (len(b) % 2)  # word-align
    ifd_off = off

    def tag(code: int, ttype: int, count: int, value: int) -> bytes:
        return _s.pack("<HHII", code, ttype, count, value)

    tags = [
        tag(256, 3, 1, ncol),                       # ImageWidth
        tag(257, 3, 1, nrow),                       # ImageLength
        tag(258, 3, 1, 32),                         # BitsPerSample
        tag(259, 3, 1, 1),                          # Compression: none
        tag(262, 3, 1, 1),                          # Photometric: BlackIsZero
        tag(273, 4, 1, blocks["strip"]),            # StripOffsets
        tag(277, 3, 1, 1),                          # SamplesPerPixel
        tag(278, 3, 1, nrow),                       # RowsPerStrip
        tag(279, 4, 1, len(data)),                  # StripByteCounts
        tag(339, 3, 1, 3),                          # SampleFormat: IEEE float
        tag(33550, 12, 3, blocks["scale"]),         # ModelPixelScale
        tag(33922, 12, 6, blocks["tie"]),           # ModelTiepoint
        tag(34735, 3, 16, blocks["keys"]),          # GeoKeyDirectory
        tag(42113, 2, len(nodata), blocks["nodata"]),  # GDAL_NODATA
    ]
    out = bytearray()
    out += _s.pack("<2sHI", b"II", 42, ifd_off)
    for name, b in (
        ("scale", pixel_scale),
        ("tie", tiepoint),
        ("keys", geokeys),
        ("nodata", nodata),
        ("strip", data),
    ):
        assert len(out) == blocks[name]
        out += b
        if len(b) % 2:
            out += b"\x00"
    out += _s.pack("<H", len(tags)) + b"".join(tags) + _s.pack("<I", 0)

    from pathlib import Path

    p = Path(path)
    p.write_bytes(bytes(out))
    return str(p)


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
