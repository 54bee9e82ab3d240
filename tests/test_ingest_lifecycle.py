"""The ingest-side lifecycle composed end to end, exercising the
round-5 second-wave operators together: JSONL landing (with corrupt
quarantine) → column census → near-dup clusters → leakage-safe splits
→ mixture-aware shard write → CDC correction → compaction. The
training-side composition lives in test_pipeline_end_to_end; this is
its upstream half."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, layout
from gedixr_spark.operators.sampling import leakage_safe_split
from gedixr_spark.operators.stats import profile_table
from gedixr_spark.sinks.merge import merge_upsert
from gedixr_spark.sources.jsonl import land_jsonl


def test_ingest_lifecycle_composes(spark, tmp_path):
    # --- 0. a raw dump: 60 docs, 12 near-dup pairs, 2 broken lines
    lines = []
    for i in range(60):
        text = f"document number {i} with content body {i % 48}"
        lines.append(
            json.dumps(
                {"doc_id": i, "text": text, "lang": "en" if i % 3 else "de",
                 "source": "web"}
            )
        )
    lines.insert(10, '{"doc_id": broken')
    lines.insert(30, "\x00garbage")
    dump = tmp_path / "dump.jsonl"
    dump.write_text("\n".join(lines) + "\n")

    # --- 1. land with quarantine
    bronze = str(tmp_path / "bronze")
    res = land_jsonl(spark, str(dump), bronze)
    assert res["n_good"] == 60 and res["n_quarantined"] == 2

    docs = spark.read.parquet(bronze)

    # --- 2. census: every column profiled, zero nulls in doc_id
    prof = {r["column"]: r for r in profile_table(docs).collect()}
    assert prof["doc_id"]["n_nulls"] == 0
    assert prof["text"]["n_rows"] == 60

    # --- 3. near-dup clusters (docs i and i+48 share the content body
    # for i < 12) → leakage-safe split: no cluster straddles a boundary
    pairs = dedup.minhash_lsh_pairs(docs, k=3, bands=3)
    clusters = dedup.dedup_clusters_star(pairs)
    split = leakage_safe_split(
        docs, clusters, fractions={"train": 0.6, "val": 0.2, "test": 0.2}
    )
    by_doc = {r["doc_id"]: r["split"] for r in split.collect()}
    straddles = [
        (r["doc_id"], r["cluster_id"])
        for r in clusters.collect()
    ]
    cluster_splits: dict[int, set] = {}
    for doc_id, cid in straddles:
        cluster_splits.setdefault(cid, set()).add(by_doc[doc_id])
    assert all(len(s) == 1 for s in cluster_splits.values()), cluster_splits

    # --- 4. write the train shard partitioned by lang
    shard = str(tmp_path / "train_shard")
    (
        split.filter(F.col("split") == "train")
        .drop("bucket", "split")
        .write.partitionBy("lang")
        .parquet(shard)
    )
    n_train = spark.read.parquet(shard).count()
    assert n_train > 0

    # --- 5. CDC correction: re-land one fixed doc, then compact the
    # fragmented partition leaf
    if any(r["lang"] == "en" for r in spark.read.parquet(shard).collect()):
        fixed_id = spark.read.parquet(shard).filter(F.col("lang") == "en").first()["doc_id"]
        fix = spark.createDataFrame(
            [(fixed_id, "corrected text", "web", "en")],
            "doc_id long, text string, source string, lang string",
        )
        merge_upsert(spark, shard, fix, keys=["doc_id"], partition_col="lang")
        got = (
            spark.read.parquet(shard)
            .filter(F.col("doc_id") == fixed_id)
            .first()
        )
        assert got["text"] == "corrected text"
        assert spark.read.parquet(shard).count() == n_train

        leaf = os.path.join(shard, "lang=en")
        before = layout.file_stats(spark, leaf)["n_files"]
        layout.compact_table(spark, leaf, target_mb=128)
        after = layout.file_stats(spark, leaf)["n_files"]
        assert after <= before
        assert spark.read.parquet(shard).count() == n_train

    # --- 6. trainer export: the train split as WebDataset tar shards
    from gedixr_spark.sinks.webdataset import write_webdataset

    wds_dir = str(tmp_path / "wds")
    manifest = write_webdataset(
        spark.read.parquet(shard), wds_dir, meta_cols=["source"],
        docs_per_shard=20,
    ).collect()
    assert sum(r["n_docs"] for r in manifest) == n_train
