from gedixr_spark.functions.scalar import (
    acq_time_from_filename,
    month_band,
    pct,
    rh_percentile,
    shot_id_str,
)

__all__ = [
    "acq_time_from_filename",
    "month_band",
    "pct",
    "rh_percentile",
    "shot_id_str",
]
