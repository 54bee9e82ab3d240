"""Versioned IVF vector-index lifecycle (operators/vectorstore.py):
search == flat ivf_ann_topk at every stage (init / upsert / changed
vector / delete), log-level file pruning actually prunes, and time
travel searches the old index."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import similarity as sim
from gedixr_spark.operators.vectorstore import (
    compact_vector_index,
    delete_vectors,
    init_vector_index,
    search_vector_index,
    update_vector_index,
    _files_for_cells,
)


def _emb(spark, ids, seed=0, dim=16):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(dim)]) for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _flat_equal(spark, path, flat, queries, k=3, nprobe=2, version=None):
    cents = sim.load_centroids(
        spark, path.rstrip("/") + "/centroids.parquet"
    )
    want = sorted(
        (r["query_id"], r["rank"], r["cand_id"], r["cosine"])
        for r in sim.ivf_ann_topk(
            queries, flat, k=k, dim=16, centroids=cents, nprobe=nprobe
        ).collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["cand_id"], r["cosine"])
        for r in search_vector_index(
            spark, path, queries, k=k, nprobe=nprobe, version=version
        ).collect()
    )
    assert got == want, (got[:5], want[:5])


def test_lifecycle_search_equals_flat(spark, tmp_path):
    path = str(tmp_path / "vidx")
    base = _emb(spark, range(100), seed=1)
    init_vector_index(
        spark, path, base, dim=16, n_cells=8, n_files=4
    )
    queries = _emb(spark, range(3), seed=9)

    _flat_equal(spark, path, base, queries)

    # incremental batch: new ids fold in
    batch = _emb(spark, range(100, 140), seed=2)
    update_vector_index(spark, path, batch)
    flat2 = base.unionByName(batch)
    _flat_equal(spark, path, flat2, queries)

    # changed vector: id 5 gets a NEW embedding -> moves cell if needed
    changed = _emb(spark, [5], seed=77)
    update_vector_index(spark, path, changed)
    flat3 = flat2.filter(F.col("vec_id") != 5).unionByName(changed)
    _flat_equal(spark, path, flat3, queries)

    # delete: ids 0-9 gone from search
    delete_vectors(spark, path, list(range(10)))
    flat4 = flat3.filter(F.col("vec_id") >= 10)
    _flat_equal(spark, path, flat4, queries)

    # time travel: version 1 is the original index
    _flat_equal(spark, path, base, queries, version=1)


def test_file_pruning_skips_cells(spark, tmp_path):
    """Cell-clustered files + log stats: probing one cell must NOT keep
    every file, and a cell-set {lo, hi} must not keep middle-only
    files (set pruning, not range pruning)."""
    path = str(tmp_path / "vidx2")
    base = _emb(spark, range(400), seed=3)
    init_vector_index(spark, path, base, dim=16, n_cells=8, n_files=8)

    keep_one, n_live, _ = _files_for_cells(spark, path, [0], None)
    # range partitioner may merge sparse partitions — just need enough
    # files for pruning to be observable
    assert n_live >= 4
    assert 0 < len(keep_one) < n_live

    keep_set, _, _ = _files_for_cells(spark, path, [0, 7], None)
    keep_range_union = set(keep_one) | set(
        _files_for_cells(spark, path, [7], None)[0]
    )
    assert set(keep_set) == keep_range_union  # no middle-cell files


def test_update_uses_persisted_centroids_not_a_refit(spark, tmp_path):
    """The centroid artifact is written once at init; update must load
    it (same cells for old and new rows) — pin by checking an updated
    row's cell equals the init-time assignment rule."""
    from gedixr_spark.sinks.versioned import read_versioned

    path = str(tmp_path / "vidx3")
    base = _emb(spark, range(50), seed=4)
    init_vector_index(spark, path, base, dim=16, n_cells=8)
    cents = sim.load_centroids(spark, path + "/centroids.parquet")
    batch = _emb(spark, range(50, 60), seed=5)
    update_vector_index(spark, path, batch)
    got = {
        r["vec_id"]: r["cell"]
        for r in read_versioned(spark, path)
        .filter(F.col("vec_id") >= 50)
        .collect()
    }
    want = {
        r["vec_id"]: r["cell"]
        for r in batch.select(
            "vec_id", sim.ivf_cell("embedding", cents).alias("cell")
        ).collect()
    }
    assert got == want


def test_compaction_recovers_pruning_after_upsert_churn(spark, tmp_path):
    """r9 VERDICT #5: changed vectors move cells on upsert, so batch
    files accumulate wide overlapping cell ranges and log-stats
    pruning degrades toward scan-everything. compact_vector_index
    re-clusters by cell in one commit: the kept-file fraction for a
    single-cell probe must RECOVER, search results must be identical
    before/after, and the pre-compaction snapshot must keep its file
    list (time travel)."""
    from gedixr_spark.sinks.versioned import live_files

    path = str(tmp_path / "vidx4")
    base = _emb(spark, range(300), seed=6)
    init_vector_index(spark, path, base, dim=16, n_cells=8, n_files=6)

    # churn: re-ingest overlapping id slices with NEW embeddings so
    # vectors change cells; each batch lands as its own small files
    flat = base
    for b in range(4):
        ids = range(b * 60, b * 60 + 120)
        batch = _emb(spark, ids, seed=100 + b)
        update_vector_index(spark, path, batch, n_files=3)
        flat = flat.filter(
            ~F.col("vec_id").isin([int(i) for i in ids])
        ).unionByName(batch)

    keep_before, live_before, _ = _files_for_cells(spark, path, [0], None)
    frag_frac = len(keep_before) / live_before

    res = compact_vector_index(spark, path, target_mb=128, n_files=6)
    assert res["meta"]["n_files_compacted"] >= 2

    keep_after, live_after, _ = _files_for_cells(spark, path, [0], None)
    # pruning recovers: strictly fewer kept files AND a smaller kept
    # fraction than the churned state
    assert len(keep_after) < len(keep_before)
    assert len(keep_after) / live_after < frag_frac
    assert 0 < len(keep_after) < live_after

    # search results identical pre/post compaction (moves rows only)
    queries = _emb(spark, range(3), seed=9)
    _flat_equal(spark, path, flat, queries)
    # pre-compaction snapshot is untouched: its live set still contains
    # every churned file the single-cell probe kept, and time-travel
    # search over it still matches flat
    pre_version = res["version"] - 1
    pre_live = set(live_files(spark, path, pre_version))
    assert set(keep_before) <= pre_live
    assert pre_live != set(live_files(spark, path, None))
    _flat_equal(spark, path, flat, queries, version=pre_version)
