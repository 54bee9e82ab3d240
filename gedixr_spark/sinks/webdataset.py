"""WebDataset-style tar-shard export — the trainer-facing sink for
text corpora: each shard is a POSIX tar whose members are
``{key}.txt`` (the document) and ``{key}.json`` (its metadata), the
layout streaming data loaders (WebDataset/wids and equivalents)
consume sequentially with zero random I/O.

Scale shape: one tar per partition, written BY THE EXECUTOR holding
that partition (no driver collect, no post-hoc packing job) —
repartition picks the shard count, `mapInPandas` wraps the partition's
Arrow batches around a single open tarfile. The returned manifest
(shard, n_docs, bytes) is executor-count rows. ``out_dir`` must be a
filesystem every executor can write (shared FS/object store via
fuse at cluster scale; local dir on local[...]).

Determinism note: WHICH docs land in a shard follows the partitioner
(round-robin repartition → hash of row); for reproducible shard
contents, pre-partition by an explicit key (e.g.
``df.repartitionByRange(n, "doc_id")``) and pass ``repartition=None``.
"""

from __future__ import annotations

import io
import json
import math
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: list[str] | None = None,
    docs_per_shard: int = 1000,
    repartition: int | None = 0,
) -> DataFrame:
    """Write ``df`` as tar shards under ``out_dir``; returns the shard
    manifest DataFrame (shard path, n_docs, n_bytes).

    ``repartition=0`` (default) derives ceil(count/docs_per_shard)
    shards; an explicit int forces that many; ``None`` keeps the
    input partitioning (for caller-controlled shard membership)."""
    meta_cols = meta_cols or []
    cols = [key_col, text_col, *meta_cols]
    data = df.select(*cols)
    if repartition == 0:
        n = data.count()
        data = data.repartition(max(1, math.ceil(n / docs_per_shard)))
    elif repartition is not None:
        data = data.repartition(repartition)
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        n_docs = 0
        with tarfile.open(path, "w") as tar:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    key = str(row[key_col])
                    text = (row[text_col] or "").encode("utf-8")
                    info = tarfile.TarInfo(f"{key}.txt")
                    info.size = len(text)
                    tar.addfile(info, io.BytesIO(text))
                    meta = json.dumps(
                        {c: _jsonable(row[c]) for c in meta_cols}
                    ).encode("utf-8")
                    info = tarfile.TarInfo(f"{key}.json")
                    info.size = len(meta)
                    tar.addfile(info, io.BytesIO(meta))
                    n_docs += 1
        if n_docs == 0:
            os.remove(path)  # empty partition: no empty shard litter
            return
        yield pd.DataFrame(
            {"shard": [path], "n_docs": [n_docs], "n_bytes": [os.path.getsize(path)]}
        )

    return data.mapInPandas(_write, schema="shard string, n_docs long, n_bytes long")


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


def read_webdataset(
    spark,
    path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Read tar shards written by `write_webdataset` back into a
    DataFrame — (key, text, meta JSON string) per document. Closes
    the export loop: a corpus handed to trainers as shards can be
    re-ingested for audits/re-filters without a separate copy.

    Scale shape: ONE task per shard (a tar is a sequential format —
    intra-file parallelism would re-read the stream per split), from a
    shard-path DataFrame mapped through ``mapInPandas``; shard count
    is the parallelism, exactly like the HDF5 granule reader
    (sources/hdf5.py). Members pair up as {key}.txt/{key}.json; a
    member missing its twin surfaces with the other field NULL rather
    than being dropped.

    Shard→task mapping is EXACT: ``parallelize`` with one slice per
    shard (range slicing) — not a hash ``repartition``, which can
    collide two shards into one task and leave others empty. Shards
    are listed through the Hadoop FileSystem API (so the listing works
    against any store Spark can see); OPENING a shard still goes
    through executor-local tarfile, so non-POSIX stores need a
    fuse-style mount — the same constraint as the writer side."""
    from gedixr_spark.operators.layout import _hadoop_fs

    fs, _ = _hadoop_fs(spark, path)
    statuses = fs.globStatus(
        spark._jvm.org.apache.hadoop.fs.Path(path + "/shard-*.tar")
    )
    shards = sorted(
        s.getPath().toUri().getPath() for s in (statuses or []) if s.isFile()
    )
    if not shards:
        raise ValueError(f"no shard-*.tar under {path}")
    paths = spark.createDataFrame(
        spark.sparkContext.parallelize([(s,) for s in shards], len(shards)),
        "shard string",
    )

    def _read(batches):
        for pdf in batches:
            for shard in pdf["shard"]:
                texts: dict[str, str] = {}
                metas: dict[str, str] = {}
                with tarfile.open(shard, "r") as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.rpartition(".")
                        body = tar.extractfile(m).read()
                        if ext == "txt":
                            texts[key] = body.decode("utf-8")
                        elif ext == "json":
                            metas[key] = body.decode("utf-8")
                keys = sorted(set(texts) | set(metas))
                yield pd.DataFrame(
                    {
                        "__key": keys,
                        "__text": [texts.get(k) for k in keys],
                        "meta": [metas.get(k) for k in keys],
                    }
                )

    out = paths.mapInPandas(
        _read, schema="__key string, __text string, meta string"
    )
    from pyspark.sql import functions as F

    return out.select(
        F.col("__key").alias(key_col),
        F.col("__text").alias(text_col),
        "meta",
    )
