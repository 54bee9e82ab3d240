"""Filter operators F1-F5 (SURVEY.md §2.3).

All are plain ``df.filter`` compositions — Catalyst pushes them into the
parquet scan (check ``PushedFilters`` in the plan), so at 100 TB these
prune row groups / files instead of scanning then dropping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gedixr_spark.constants import ALL_BEAMS, COVERAGE_BEAMS, POWER_BEAMS
from gedixr_spark.functions.scalar import month_band

def quality_predicate() -> Column:
    """F1 — conjunctive quality predicate (reference extract.py:303-339,
    the predicate string at 330-331; docs/quality.md:10-17). NB the
    docstring in the reference disagrees with its code
    (num_detectedmodes > 1 vs > 0; elevation comparison inverted) — the
    CODE wins (SURVEY §2.3 F1). Built lazily: Columns need a session."""
    return (
        (F.col("quality_flag") == 1)
        & (F.col("degrade_flag") == 0)
        & (F.col("num_detectedmodes") > 0)
        & (F.abs(F.col("elev") - F.col("elev_dem_tdx")) < 100)
    )


def quality_filter(df: DataFrame, drop_flags: bool = True) -> DataFrame:
    """Apply the reference's quality filter; optionally drop the two flag
    columns afterwards exactly as the reference does (extract.py:333)."""
    out = df.filter(quality_predicate())
    if drop_flags:
        out = out.drop("quality_flag", "degrade_flag")
    return out


def month_filter(df: DataFrame, lo: int, hi: int, ts_col: str = "acq_time") -> DataFrame:
    """F2 — inclusive month-of-acquisition band with reversed-bound swap
    (reference extract.py:138-146). On a bronze layout partitioned by
    acquisition date this prunes whole files, matching the reference's
    skip-before-open behavior."""
    return df.filter(month_band(ts_col, lo, hi))


def resolve_beams(beams: str | Sequence[str] | None) -> list[str]:
    """Beam-spec resolution (reference extract.py:112-119):
    None → all 8, 'power'/'coverage' → the 4-beam groups, else explicit."""
    if beams is None:
        return list(ALL_BEAMS)
    if isinstance(beams, str):
        key = beams.lower()
        if key == "power":
            return list(POWER_BEAMS)
        if key == "coverage":
            return list(COVERAGE_BEAMS)
        return [beams]
    return list(beams)


def beam_filter(df: DataFrame, beams: str | Sequence[str] | None) -> DataFrame:
    """F3 — beam membership filter. In the HDF5 reader the same list
    prunes group reads (SURVEY §2.3 F3); on a shot table it's an isin."""
    resolved = resolve_beams(beams)
    if set(resolved) >= set(ALL_BEAMS):
        return df
    return df.filter(F.col("beam").isin(resolved))


def bbox_filter(
    df: DataFrame,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
) -> DataFrame:
    """F4 (axis-aligned case) — spatial subset by bounding box, expressed
    as range predicates so it pushes down to the scan. For arbitrary
    polygons see operators.joins.spatial_join_aoi."""
    return df.filter(
        F.col(lon_col).between(xmin, xmax) & F.col(lat_col).between(ymin, ymax)
    )
