"""CSV ingest with corrupt-record quarantine — same design as
`sources/jsonl.py` (text scan + from_csv keeps the raw line next to
the parse in one projection; explicit schema, never inference;
PERMISSIVE + quarantine, never fail/drop). CSV is the interchange
format metadata tables and labels arrive in; the quarantine matters
just as much as for JSONL — a torn line or a stray delimiter must
neither kill a 100 TB-adjacent job nor vanish."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gedixr_spark.sources.jsonl import _BLANK_LINE

_CORRUPT = "_corrupt_record"


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read delimited text under ``path`` → (good, quarantine).

    ``header=True`` drops lines that exactly equal the schema's
    header row (per-file header handling without a driver-side file
    loop; a data row that is byte-identical to the header is
    indistinguishable — documented limitation of the one-pass shape).
    Type-mismatched or mis-delimited lines go to quarantine as raw
    bytes with their source file."""
    landing = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.input_file_name().alias("source_file"),
        F.col("value"),
        F.from_csv(
            "value",
            landing.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": _CORRUPT,
                "sep": sep,
            },
        ).alias("__c"),
    )
    # same str.strip()-blank rule as read_jsonl (F.trim strips only
    # ASCII space; a "\x0c" line must be blank, not quarantined)
    nonblank = parsed.filter(~F.col("value").rlike(_BLANK_LINE))
    if header:
        header_line = sep.join(f.name for f in schema.fields)
        nonblank = nonblank.filter(F.col("value") != header_line)
    good = (
        nonblank.filter(F.col(f"__c.{_CORRUPT}").isNull())
        .select("__c.*")
        .drop(_CORRUPT)
    )
    bad = nonblank.filter(F.col(f"__c.{_CORRUPT}").isNotNull()).select(
        "source_file", F.col("value").alias("raw")
    )
    return good, bad
