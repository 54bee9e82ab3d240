"""gedixr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference package ``maawoo/gedixr``
(GEDI lidar ETL: HDF5 -> shot tables -> filter -> join -> GeoParquet ->
raster), re-designed Spark-first for cluster scale.

Design stance (SURVEY.md §7.0):
- DataFrame/SQL API only; lazy end-to-end; no RDD code.
- The reference's eager per-file loop becomes one lazy plan.
- The reference's AOI dict becomes an ``aoi_name`` column.
- Geospatial ops are pure column math (lon/lat doubles + WKB helpers);
  no Sedona dependency is available in this environment.
"""

from gedixr_spark.session import get_spark
from gedixr_spark import constants

__version__ = "0.1.0"


def extract_data(*args, **kwargs):
    """Lazy re-export of :func:`gedixr_spark.api.extract_data` (the
    reference's entry point) without importing the API module at
    package import time."""
    from gedixr_spark.api import extract_data as _extract

    return _extract(*args, **kwargs)


def prepare_corpus(*args, **kwargs):
    """Lazy re-export of :func:`gedixr_spark.pipeline.prepare_corpus`
    (the training-data surface's one-call pipeline)."""
    from gedixr_spark.pipeline import prepare_corpus as _prep

    return _prep(*args, **kwargs)


__all__ = [
    "get_spark",
    "constants",
    "extract_data",
    "prepare_corpus",
    "__version__",
]
