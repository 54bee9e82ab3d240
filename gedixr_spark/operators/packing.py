"""Sequence packing — the batch-assembly step of an LLM training-data
pipeline: pack variable-length documents into fixed token-budget
training sequences with minimal padding waste.

No reference counterpart (the reference is a geospatial ETL package);
this extends the §7.4 training-pipeline surface alongside dedup /
similarity / text analysis.

Semantics: deterministic next-fit-decreasing (NFD) per pack group.
Docs are hash-sharded into ``n_groups`` independent groups
(``doc_id % n_groups`` — engine-portable, no hash function parity
issues), each group sorts by (n_tokens DESC, doc_id ASC) and a single
sequential next-fit pass assigns sequence ids: a doc joins the current
sequence if it fits the remaining budget, else opens a new one. A doc
longer than the budget occupies a sequence of its own (real pipelines
then truncate or split it; packing itself stays total and
deterministic).

Scale shape (100 TB): packing is inherently sequential WITHIN a bin
stream but embarrassingly parallel ACROSS groups — exactly the
applyInPandas layout here: one shuffle on pack_group, then each group
packs independently inside an Arrow batch; documents' text never
moves, only (doc_id, n_tokens). Waste is bounded by the group-local
decision (NFD waste ≤ 2× optimal; in practice a few % at realistic
doc/budget ratios — measure with ``packing_stats``). More groups = more
parallelism and marginally more waste (one partially-filled tail
sequence per group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "doc_id long, n_tokens long, pack_group long, seq_id long"


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    n_groups: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    group_col: str | None = None,
) -> DataFrame:
    """Assign every doc a (pack_group, seq_id) under ``budget`` tokens
    per sequence via next-fit-decreasing within ``doc_id % n_groups``
    groups. Output: (doc_id, n_tokens, pack_group, seq_id) — ids only;
    join text/payload back by doc_id downstream so the wide columns
    never ride through the packing shuffle.

    pack_group uses ``pmod`` (always non-negative); the DuckDB oracle
    mirrors it with ``((doc_id % n) + n) % n`` so negative doc_ids group
    identically across engines (plain ``%`` follows the dividend sign in
    DuckDB).

    ``group_col`` names a PRECOMPUTED pack-group column instead of the
    pmod derivation — the storage-co-location hook: a table bucketed by
    that column (``sinks.bucketed.write_bucketed(..., keys=group_col)``)
    already satisfies the groupBy's clustering, so the packing pass runs
    with NO shuffle at all (plan-asserted in tests/test_bucketed.py).
    At 100 TB that turns the one packing exchange into a pure map-side
    pass over the bucketed files; ``n_groups`` is ignored for grouping
    when ``group_col`` is given."""
    if budget <= 0 or n_groups <= 0:
        raise ValueError(f"need budget > 0 and n_groups > 0, got {budget}, {n_groups}")
    group_expr = (
        F.pmod(F.col(id_col).cast("long"), F.lit(n_groups))
        if group_col is None
        else F.col(group_col).cast("long")
    )
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        group_expr.alias("pack_group"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        seq_ids = np.empty(len(toks), dtype=np.int64)
        fill = np.int64(0)
        seq = np.int64(0)
        for i, t in enumerate(toks):
            if i == 0 or fill + t > budget:
                if i != 0:
                    seq += 1
                fill = t
            else:
                fill += t
            seq_ids[i] = seq
        pdf["seq_id"] = seq_ids
        return pdf[["doc_id", "n_tokens", "pack_group", "seq_id"]]

    return src.groupBy("pack_group").applyInPandas(_pack, _OUT_SCHEMA)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Fill-efficiency audit of a ``pack_sequences`` result: per-group
    sequence count, packed token total, and fill ratio (exact long sums
    into one double division). The number a pipeline owner watches —
    waste == padding tokens the training run pays for."""
    per_seq = packed.groupBy("pack_group", "seq_id").agg(
        F.sum("n_tokens").alias("seq_fill"), F.count(F.lit(1)).alias("n_docs")
    )
    return per_seq.groupBy("pack_group").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("seq_fill").alias("total_tokens"),
        F.sum("n_docs").alias("n_docs"),
        (
            F.sum("seq_fill").cast("double")
            / (F.count(F.lit(1)) * F.lit(budget)).cast("double")
        ).alias("fill_ratio"),
    )


def materialize_packed(
    packed: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Assemble trainer-ready sequences from a ``pack_sequences``
    result: join text back by doc id (the ONLY point where document
    bodies move — one shuffle, after packing decided placement on ids
    alone), then per (pack_group, seq_id) emit the concatenated text,
    the ordered doc ids, and token boundary offsets (exclusive running
    sums — the attention-mask reset points when training on packed
    sequences). Document order inside a sequence is the packing order
    (n_tokens DESC, doc_id ASC), so output is deterministic.

    Plan: one equi-join on doc_id + one hash agg on (pack_group,
    seq_id) — sort happens inside each sequence's collected struct
    list (sequences are budget-bounded, so per-group state is small by
    construction)."""
    joined = packed.join(docs.select(id_col, text_col), id_col)
    # collect_list is order-nondeterministic under parallel agg →
    # array_sort the budget-bounded list by the packing order key
    # (-n_tokens, doc_id) encoded in struct field order
    key_entry = F.struct(
        (-F.col("n_tokens")).alias("neg_tokens"),
        F.col(id_col).alias("doc_id"),
        # NULL text would be silently SKIPPED by array_join (no element,
        # no separator) while doc_ids/boundaries/seq_tokens still count
        # the doc — coalesce to '' so every doc occupies a position in
        # seq_text and boundary offsets stay aligned
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
        F.col("n_tokens").alias("n_tokens"),
    )
    agg = joined.groupBy("pack_group", "seq_id").agg(
        F.array_sort(F.collect_list(key_entry)).alias("entries")
    )
    entries = F.col("entries")
    return agg.select(
        "pack_group",
        "seq_id",
        F.transform(entries, lambda e: e["doc_id"]).alias("doc_ids"),
        F.array_join(F.transform(entries, lambda e: e["text"]), sep).alias("seq_text"),
        # exclusive prefix sums of token counts = sequence-local start
        # offset of each doc (the attention-reset boundaries)
        F.expr(
            "transform(entries, (e, i) -> "
            "aggregate(slice(entries, 1, i), 0L, (acc, x) -> acc + x.n_tokens))"
        ).alias("boundaries"),
        F.aggregate(
            entries, F.lit(0).cast("long"), lambda a, e: a + e["n_tokens"]
        ).alias("seq_tokens"),
    )
