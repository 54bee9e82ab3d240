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

    # 1c. compression-ratio rail: drop the extreme tails (template spam
    # below, random noise above); None ratios (empty text) pass through
    scored_cr = text.compression_ratio(clean)
    clean = scored_cr.filter(
        F.col("compression_ratio").isNull()
        | F.col("compression_ratio").between(0.05, 0.98)
    ).drop("compression_ratio")
    n_cr = clean.count()
    assert 0 < n_cr <= n_lm

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


def test_training_data_pipeline_v2_composes_r5_operators(spark, sf_dir):
    """Round-5 composition: trained quality gate → temperature mixing →
    BPE token counts → packing → deterministic epoch order. Proves the
    new operators chain on the real documents fixture with schemas and
    row accounting intact (each is differential-tested in isolation)."""
    import numpy as np

    from gedixr_spark.operators import bpe, classify, text
    from gedixr_spark.operators.packing import pack_sequences
    from gedixr_spark.operators.sampling import epoch_order, mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. trained quality gate: fit on a weak-label slice (the heuristic
    # gate provides the labels — the production bootstrap pattern),
    # score the full corpus, keep predicted-good
    feats = classify.quality_feature_vector(docs)
    weak = feats.withColumn(
        "label",
        (
            (F.col("n_tokens") >= 5) & (F.col("stopword_ratio") >= 0.05)
        ).cast("double"),
    )
    w = classify.logreg_fit(weak, n_iter=40, lr=0.5)
    gated = classify.logreg_predict(feats, w).filter(F.col("quality_pred") == 1)
    n_gated = gated.count()
    assert 0 < n_gated <= n_raw

    # 2. temperature mixing over language domains (T=0.5)
    mixed = mixture_sample(
        gated.select("doc_id", "text", "lang"), domain_col="lang", temperature=0.5
    )
    n_mixed = mixed.count()
    assert n_mixed > 0
    # copies are distinguishable for downstream salting
    assert mixed.select("doc_id", "copy_n").distinct().count() == n_mixed

    # 3. exact BPE token counts with merges trained on a deterministic
    # slice; feed packing on the trained-tokenizer numbers
    merges = bpe.bpe_train(
        bpe.word_counts(docs.filter(F.col("doc_id") < 100)), n_merges=5
    )
    assert merges
    counted = bpe.bpe_token_count(
        mixed.select("doc_id", "copy_n", "text").withColumn(
            "mix_id",
            F.col("doc_id") * 1000 + F.col("copy_n"),
        ),
        merges,
    )
    packed = pack_sequences(
        counted, budget=512, n_groups=8, id_col="mix_id", tokens_col="n_bpe_tokens"
    )
    assert packed.count() == n_mixed  # every mixed row packed once

    # 4. deterministic epoch order over the packed sequence ids
    seq_ids = packed.select(
        (F.col("pack_group") * 1_000_000 + F.col("seq_id")).alias("seq_key")
    ).distinct()
    e1 = [r["seq_key"] for r in epoch_order(seq_ids, epoch=1, id_col="seq_key", n_partitions=4).collect()]
    e2 = [r["seq_key"] for r in epoch_order(seq_ids, epoch=2, id_col="seq_key", n_partitions=4).collect()]
    assert sorted(e1) == sorted(e2) and e1 != e2


def test_prepare_training_shards_end_to_end(spark, tmp_path):
    """corpus → gates/dedup/splits → BPE(train-only) → token ids →
    packing → WebDataset shards, per split. Checks: every shard doc is
    a packed sequence whose doc_ids trace back to exactly one split
    (leakage-safe at the shard level), boundaries parse, and token
    accounting is consistent on re-read."""
    import json as _json

    from gedixr_spark.pipeline import prepare_training_shards
    from gedixr_spark.sinks.webdataset import read_webdataset

    rows = []
    for i in range(40):
        body = f"sample document {i} about data systems " * (2 + i % 4)
        rows.append((i, body.strip()))
    # two exact dups + one near-dup to exercise the dedup rails
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1] + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = str(tmp_path / "shards")
    res = prepare_training_shards(
        docs, out, n_merges=8, budget=64, n_groups=2, docs_per_shard=10
    )
    assert res["merges"], "BPE training produced no merges"
    assert res["vocab"].count() > 0

    split_of = {
        r["doc_id"]: r["split"] for r in res["splits"].collect()
    }
    total_docs = 0
    for split, manifest in res["manifests"].items():
        shards = manifest.collect()
        if not shards:
            continue
        back = read_webdataset(
            spark, f"{out}/{split}", key_col="seq_key", text_col="seq_text"
        ).collect()
        for r in back:
            meta = _json.loads(r["meta"])
            doc_ids = _json.loads(meta["doc_ids"])
            bounds = _json.loads(meta["boundaries"])
            assert len(bounds) == len(doc_ids)
            assert bounds[0] == 0 and bounds == sorted(bounds)
            for d in doc_ids:
                assert split_of[d] == split, (d, split)
            total_docs += len(doc_ids)
    # every surviving split doc landed in exactly one sequence
    assert total_docs == res["splits"].count()
