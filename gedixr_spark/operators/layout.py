"""Space-filling-curve data layout — the file-pruning story for
spatial tables at 100 TB (SURVEY §4 bronze-layout note made concrete).

A bbox query against parquet prunes at two levels: partition/file
elimination from footer min/max stats, then row-group elimination
inside surviving files. Both only bite if spatially-near rows are
near in FILE order — which a Z-order (Morton) key delivers with pure
column math: interleave the bits of the quantized lon/lat so
lexicographic key order ≈ spatial locality. ``write_zordered`` =
range-partition by the key + sort within partitions + plain parquet
write; every executor writes a compact spatial tile, so the footer
stats of each file span a sliver of the globe and a bbox scan touches
only the overlapping files. (Same mechanics Delta/Iceberg OPTIMIZE
ZORDER applies — here as a plain DataFrame op with no table format.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_index(
    lon: Column | str = "longitude",
    lat: Column | str = "latitude",
    bits: int = 16,
) -> Column:
    """Morton key of the (lon, lat) cell on a 2^bits × 2^bits global
    grid — JVM-side integer expression (shift/mask interleave unrolled
    at plan-build time; no UDF, codegen-friendly). bits=16 → ~600 m
    cells at the equator and a 32-bit key; raise bits for finer tiles
    (≤31 keeps the key in a positive long)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    lo = F.col(lon) if isinstance(lon, str) else lon
    la = F.col(lat) if isinstance(lat, str) else lat
    n = (1 << bits) - 1
    # clamp into the valid globe, then quantize to cell ordinates
    x = F.floor(
        (F.least(F.greatest(lo, F.lit(-180.0)), F.lit(180.0)) + 180.0) / 360.0 * n
    ).cast("long")
    y = F.floor(
        (F.least(F.greatest(la, F.lit(-90.0)), F.lit(90.0)) + 90.0) / 180.0 * n
    ).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    n_files: int = 8,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    bits: int = 16,
) -> str:
    """Write ``df`` as parquet laid out along the Z-curve:
    range-partition on the Morton key (contiguous key ranges → compact
    spatial tiles per file) and sort within each partition (row-group
    stats get tight too). The key column is dropped from the output —
    it is derivable, and layout is a storage concern, not schema."""
    (
        df.withColumn("__z", zorder_index(lon_col, lat_col, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
