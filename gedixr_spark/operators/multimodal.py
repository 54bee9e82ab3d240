"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §7.4). Image/audio libraries are NOT in this container, so
the decode step is stubbed behind import-guards / deterministic fakes —
but the Spark-side plumbing is real and tested: binary column schema,
metadata struct, Arrow-batched mapInPandas feature extraction with an
explicit output schema, and batch-shape control.

At 100 TB the pattern is: payloads live in parquet binary columns (or
object-store URIs for > ~1 MB blobs); decode/resize/frame-sample runs
as mapInPandas over row groups so one task owns a contiguous byte
range; extracted features are small typed columns that downstream
relational ops join/filter without touching bytes again.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in for real media bytes: payload = md5 digest
    bytes of the text; metadata struct carries the declared modality and
    synthetic dimensions. Schema-identical to what a real ingest would
    produce (binary + struct<media_type,width,height>)."""
    return df.select(
        "*",
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.length(text_col) % 640 + 1).alias("width"),
            (F.length(text_col) % 480 + 1).alias("height"),
        ).alias("media_meta"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_histogram4", ArrayType(LongType())),
        StructField("decode_status", StringType()),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas. The 'decode' is a deterministic fake (byte statistics)
    because no image codec ships in this container; a real deployment
    swaps `_decode_batch` for PIL/ffmpeg and keeps every other line.
    """

    # _decode_batch is NESTED so the mapInPandas closure pickles by
    # value and runs on workers that can't import this package (bare
    # driver sessions) — same rule as the geo codec factories
    def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            # the real path would be: from PIL import Image  # noqa
            raise ImportError("no image codec in this environment")
        except ImportError:
            status = "stub"
        out = []
        for _id, payload in zip(pdf[id_col], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr >> 6, minlength=4).astype(np.int64)
            out.append(
                {
                    "doc_id": _id,
                    "n_bytes": int(arr.size),
                    "mean_byte": float(arr.mean()),
                    "byte_histogram4": hist.tolist(),
                    "decode_status": status,
                }
            )
        return pd.DataFrame(out)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df.select(id_col, "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize placeholder: real codecs are unavailable, so this
    raises by contract (clearly-marked stub per the build brief). The
    call signature, partitioning and schema are what a PIL-backed
    implementation would use."""
    raise NotImplementedError(
        "image resize requires a codec library (PIL/opencv) not present in "
        "this container; wire _decode_batch to the codec and emit "
        "binary payloads of the resized frames"
    )


def frame_sample_stub(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling placeholder — same contract as resize_stub."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg/pyav, not present in this container"
    )
