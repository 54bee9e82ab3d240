"""JSONL corpus ingest with corrupt-record quarantine — the staple
landing format for web-scale text corpora (one JSON doc per line, files
split-able by newline, so a 100 TB dump parallelizes for free).

Design points, all Spark-native:
- **Explicit schema, never inference.** Schema inference is a full
  extra pass over the data (a second 100 TB scan) and locks in
  whatever the first dump happened to contain. Callers pass the
  schema; `DOCUMENT_SCHEMA` covers the engine's documents shape.
- **text scan + from_json, not the json reader.** Reading as text and
  parsing with ``from_json`` keeps the raw line available next to the
  parsed struct in ONE projection — which is exactly what the builtin
  json source refuses (QUERY_ONLY_CORRUPT_RECORD_COLUMN makes
  corrupt-line triage require a cache/save barrier). Parsing is still
  JVM-side Jackson inside codegen; nothing touches Python.
- **PERMISSIVE + quarantine, never fail/drop.** Real dumps contain
  truncated lines, BOMs, concatenated objects. Good rows flow on;
  every broken line lands in a (source_file, raw) quarantine table —
  at scale "2 bad lines in a billion" must not kill the job OR vanish
  silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the engine's documents-table shape (TESTDATA.md) as a landing schema
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"

# Matches a line that Python's str.strip() would reduce to "": Unicode
# whitespace ((?U)\s = White_Space property) plus FS/GS/RS/US controls.
_BLANK_LINE = r"(?U)^[\s\x1c-\x1f]*$"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON under ``path`` (file, dir, or glob)
    → (good, quarantine).

    good: rows matching ``schema`` (missing fields → null — JSONL is
    schema-on-read; extra fields are ignored by the projection). A
    well-formed line with legitimate nulls stays good; a line that
    fails to parse — or whose value can't be cast to the schema type
    (FAILFAST inside from_json would abort; PERMISSIVE flags it) —
    goes to quarantine as its raw bytes.

    Both branches project from the same text scan; each is a single
    pass with the parse inside whole-stage codegen.
    """
    landing = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.input_file_name().alias("source_file"),
        F.col("value"),
        F.from_json(
            "value",
            landing,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("__j"),
    )
    # blank lines parse to an all-null struct — not data, not an error.
    # "Blank" means Python str.strip() blank: any Unicode whitespace
    # ((?U) makes \s match the White_Space property, not just 0x20)
    # plus the \x1c-\x1f separators Python's isspace() also strips.
    # F.trim strips ASCII space only and would send a "\x0c" line to
    # quarantine (caught by the hypothesis fuzz property).
    nonblank = parsed.filter(~F.col("value").rlike(_BLANK_LINE))
    good = (
        nonblank.filter(F.col(f"__j.{_CORRUPT}").isNull())
        .select("__j.*")
        .drop(_CORRUPT)
    )
    bad = nonblank.filter(F.col(f"__j.{_CORRUPT}").isNotNull()).select(
        "source_file", F.col("value").alias("raw")
    )
    return good, bad


def land_jsonl(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> dict:
    """Bronze landing: parse ``src_path``, write good rows as parquet to
    ``dest_path`` and the quarantine to ``dest_path + '.quarantine'``.
    Returns counts."""
    good, bad = read_jsonl(spark, src_path, schema=schema)
    good.write.mode("overwrite").parquet(dest_path)
    quarantine_path = dest_path.rstrip("/") + ".quarantine"
    n_bad = bad.count()
    if n_bad:
        bad.write.mode("overwrite").parquet(quarantine_path)
    n_good = spark.read.parquet(dest_path).count()
    return {
        "n_good": n_good,
        "n_quarantined": n_bad,
        "dest": dest_path,
        "quarantine": quarantine_path if n_bad else None,
    }
