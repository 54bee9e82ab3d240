"""Scalar column functions — the engine's X1-X7 surface (SURVEY.md §2.7).

All are compositions of built-in ``pyspark.sql.functions`` so they stay
inside whole-stage codegen; no Python UDFs on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gedixr_spark.constants import FILENAME_DATE_FORMAT, FILENAME_DATE_REGEX


def acq_time_from_filename(filename: Column | str) -> Column:
    """Granule acquisition timestamp from its filename.

    X1+X2: regex-extract the 13-digit token after ``A_``/``B_`` and parse
    it with the day-of-year pattern ``%Y%j%H%M%S`` (reference
    ``extract.py:232-236``). Returns NULL when the name doesn't match.
    """
    col = F.col(filename) if isinstance(filename, str) else filename
    token = F.regexp_extract(col, FILENAME_DATE_REGEX, 1)
    return F.when(token != "", F.to_timestamp(token, FILENAME_DATE_FORMAT))


def rh_percentile(rh: Column | str, percentile: int) -> Column:
    """Relative-height percentile in integer centimeters.

    P2: index the 101-element ``rh`` array (meters) at ``percentile``,
    scale m→cm, round, cast to int (reference ``extract.py:281-286``).
    ``element_at`` is 1-based, the reference's numpy indexing 0-based.
    """
    if not 0 <= percentile <= 100:
        raise ValueError(f"percentile must be in [0, 100], got {percentile}")
    col = F.col(rh) if isinstance(rh, str) else rh
    return F.round(F.element_at(col, percentile + 1) * 100).cast("int")


def shot_id_str(shot_number: Column | str) -> Column:
    """Zero-pad a shot number to an 18-char string (reference extract.py:290)."""
    col = F.col(shot_number) if isinstance(shot_number, str) else shot_number
    return F.lpad(col.cast("string"), 18, "0")


def month_band(ts: Column | str, lo: int, hi: int) -> Column:
    """Inclusive calendar-month-band predicate.

    F2 semantics (reference ``extract.py:138-146``): keep rows whose
    month-of-acquisition lies in ``[lo, hi]`` — a band *within each
    year*, not a date range; reversed bounds are auto-swapped
    (extract.py:139-140).
    """
    if lo > hi:
        lo, hi = hi, lo
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.month(col).between(lo, hi)


def pct(part: Column, whole: Column, decimals: int = 2) -> Column:
    """Percentage ``round(100 * part / whole, decimals)`` (reference extract.py:335)."""
    return F.round(part * 100.0 / whole, decimals)
