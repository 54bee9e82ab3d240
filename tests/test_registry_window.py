"""Guards the driver's 50-slot correctness-recording window.

The driver records CORRECTNESS rows for at most the FIRST 50 entries of
``__spark_entry__.queries()``. As of round 4 exactly the 50 oracle-backed
queries fill that window; the 2 rows-only-by-design queries
(approx_distinct, kmeans) sit at slots 51-52. This ordering is
load-bearing: an insertion in the middle of the registry would silently
push an oracle-backed query out of the recorded window and downgrade it
to "unrecorded" without any test failing. These tests make that a hard
failure instead (VERDICT r4 item #3 / ROUND_NOTES invariant #6).

No SparkSession needed — pure registry-shape checks.
"""

from __future__ import annotations

import __spark_entry__ as entry

RECORDED_WINDOW = 50


def test_first_50_queries_are_all_oracle_backed():
    qs = list(entry.queries())
    oracles = entry.oracle_sql()
    recorded = qs[:RECORDED_WINDOW]
    missing = [name for name in recorded if name not in oracles]
    assert not missing, (
        f"queries() slots 1-{RECORDED_WINDOW} must all have oracle_sql() "
        f"entries (the driver hash-checks exactly that window); missing "
        f"oracles for: {missing}. An insertion probably pushed an "
        f"oracle-backed query past slot {RECORDED_WINDOW} — reorder so "
        f"rows-only queries stay at the end."
    )


def test_no_oracle_backed_query_sits_outside_the_window():
    qs = list(entry.queries())
    oracles = entry.oracle_sql()
    overflow = [name for name in qs[RECORDED_WINDOW:] if name in oracles]
    assert not overflow, (
        f"Oracle-backed queries found beyond slot {RECORDED_WINDOW}: "
        f"{overflow}. The driver will never record their hash-match — "
        f"either merge queries (labeled union) to fit the window or "
        f"consciously demote them and update this test."
    )


def test_rows_only_tail_is_exactly_the_known_set():
    qs = list(entry.queries())
    oracles = entry.oracle_sql()
    tail = [name for name in qs if name not in oracles]
    # every rows-only query must sit after the recorded window
    positions = {name: qs.index(name) for name in tail}
    late = {n: p for n, p in positions.items() if p < RECORDED_WINDOW}
    assert not late, f"rows-only queries inside the recorded window: {late}"
    known_rows_only = {
        "approx_distinct",
        "kmeans_clusters",
        "semantic_dedup",
        "mixture_sample",
        "bpe_tokens",
        "distinct_rollup",
        "profile_docs",
        "compression_gate",
        "pagerank",
        "bm25_search",
        "sq8_ann_topk",
        "ivf_sq8_topk",
        # r8: 1-bit binary quantization ANN (Hamming shortlist)
        "bq_ann_topk",
        "contrastive_triplets",
        "hybrid_search",
        "weighted_sample",
        "vector_index",
        # r8: multi-table atomic publish lifecycle (multi-commit)
        "catalog_snapshot",
        # r11: row-level CDC feed lifecycle (multi-commit)
        "table_changes_feed",
        # r12: column-mapping / quarantine / CDC-consumption lifecycles
        "schema_evolution",
        "quarantine_readmit",
        "cdc_incremental_state",
        # r14: streaming CDC mirror + parquet-manifest checkpoint
        # lifecycles (multi-commit)
        "cdc_mirror",
        "manifest_checkpoint",
        # r7: bloom_join / heavy_hitters / term_search / edit_distance
        # promoted into the recorded window (labeled-union consolidation
        # freed the slots)
        # r8: asof_bucketed promoted (DuckDB ASOF JOIN oracle) + new
        # corpus_budget recorded; ann_suite consolidation funded both
    }
    assert set(tail) == known_rows_only or tail == [], (
        f"rows-only set changed: {tail}. If deliberate (a genuinely "
        f"non-SQL-expressible operator), update this list; otherwise add "
        f"an oracle."
    )


def test_every_oracle_has_a_query():
    qs = entry.queries()
    dangling = [name for name in entry.oracle_sql() if name not in qs]
    assert not dangling, f"oracle_sql() entries without queries(): {dangling}"
