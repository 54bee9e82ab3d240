"""The full training-data pipeline composed end to end on the real
documents fixture: quality gate → exact dedup → near-dedup (LSH → star
CC → apply) → token counts → sequence packing → trainer-ready
materialization. Each operator is driver/oracle-checked in isolation;
this proves they COMPOSE — schemas line up, survivors flow through,
every surviving doc lands in exactly one packed sequence."""

from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, text
from gedixr_spark.operators.packing import (
    materialize_packed,
    pack_sequences,
    packing_stats,
)


def test_training_data_pipeline_composes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. quality gate (pure column predicate — no shuffle)
    clean = text.filter_documents(docs, min_tokens=3, min_stopword_ratio=None)
    n_clean = clean.count()
    assert 0 < n_clean <= n_raw

    # 1b. LM perplexity gate: train on the clean corpus itself, keep
    # below the 90th-percentile bits/token (self-trained LM drops only
    # the most out-of-distribution tail)
    bigrams, unigrams = text.train_bigram_lm(clean)
    scored = text.lm_bits_per_token(clean, bigrams, unigrams)
    (cut,) = text.perplexity_cutoffs(scored, fractions=[0.9])
    clean = text.perplexity_filter(
        clean, bigrams, unigrams, cut, keep_unscorable=True
    ).drop("lm_bits_per_token")
    n_lm = clean.count()
    assert 0 < n_lm <= n_clean

    # 2. exact dedup: collapse byte-identical texts to min-id survivors
    exact = dedup.exact_dedup(clean)
    exact_survivors = clean.join(
        exact.select("doc_id"), "doc_id", "semi"
    )

    # 3. near-dedup: LSH candidates → star connected components → apply
    pairs = dedup.minhash_lsh_pairs(exact_survivors, k=4, bands=2)
    clusters = dedup.dedup_clusters_star(pairs)
    deduped = dedup.apply_dedup(exact_survivors, clusters)
    n_final = deduped.count()
    assert 0 < n_final <= n_clean

    # 4. pack into training sequences on real token counts
    counts = deduped.select("doc_id", text.token_count("text").alias("n_tokens"))
    packed = pack_sequences(counts, budget=256, n_groups=8)
    # every surviving doc packed exactly once
    assert packed.count() == n_final
    assert packed.select("doc_id").distinct().count() == n_final

    # 5. trainer-ready sequences: text joins back, boundaries exact
    seqs = materialize_packed(packed, deduped)
    row = seqs.orderBy("pack_group", "seq_id").first()
    b = row["boundaries"]
    assert b[0] == 0 and b == sorted(b) and b[-1] < row["seq_tokens"]
    assert len(row["doc_ids"]) == len(b)
    # no sequence over budget unless it is a single oversize doc
    bad = seqs.filter(
        (F.col("seq_tokens") > 256) & (F.size("doc_ids") > 1)
    ).count()
    assert bad == 0

    # 6. fill accounting adds up across the whole corpus
    stats = packing_stats(packed, budget=256)
    total = stats.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).collect()[0]
    assert total["docs"] == n_final
    assert (
        total["toks"]
        == counts.agg(F.sum("n_tokens").cast("long").alias("s")).collect()[0]["s"]
    )
