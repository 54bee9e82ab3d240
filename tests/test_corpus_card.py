"""corpus_card: exact facets against DuckDB, approximations against
exact twins, degenerate inputs."""

from __future__ import annotations

import duckdb
import pytest

from gedixr_spark.operators.report import corpus_card


def test_card_exact_facets_match_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    card = corpus_card(docs)
    want = duckdb.sql(
        f"""
        SELECT count(*),
               sum(length(text)),
               sum(len(list_filter(string_split(text, ' '), t -> t != ''))),
               count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchone()
    assert card["n_docs"] == want[0]
    assert card["n_chars_total"] == want[1]
    assert card["n_tokens_total"] == want[2]
    assert card["tokens_mean"] == pytest.approx(want[2] / want[0])
    # HLL dup-rate within tolerance of the exact rate
    exact_rate = 1.0 - want[3] / want[0]
    assert card["exact_dup_rate"] == pytest.approx(exact_rate, abs=0.03)
    assert card["tokens_p50"] <= card["tokens_p95"]
    # language mix exact
    langs = dict(
        duckdb.sql(
            f"SELECT lang, count(*) FROM '{sf_dir}/documents.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert card["langs"] == langs


def test_card_counts_empty_docs_and_missing_lang(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    card = corpus_card(df, lang_col="lang")  # column absent
    assert card["n_docs"] == 4
    assert card["n_empty"] == 3
    assert "langs" not in card
    assert card["n_tokens_total"] == 2


def test_card_duplicate_heavy_corpus(spark):
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(50)] + [(99, "unique one")],
        "doc_id long, text string",
    )
    card = corpus_card(df)
    # 51 docs, 2 distinct contents → dup rate ≈ 49/51
    assert card["exact_dup_rate"] == pytest.approx(49 / 51, abs=0.03)


def test_webdataset_roundtrip(spark, tmp_path):
    """write_webdataset → read_webdataset is lossless for (key, text,
    meta): every doc comes back, text byte-identical, meta JSON
    parseable, one task per shard."""
    import json

    from gedixr_spark.sinks.webdataset import read_webdataset, write_webdataset

    df = spark.createDataFrame(
        [(i, f"text {i} ü", f"lang{i % 3}") for i in range(57)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df, out, meta_cols=["lang"], docs_per_shard=20
    ).collect()
    assert sum(m["n_docs"] for m in manifest) == 57
    back = read_webdataset(spark, out)
    got = {r["doc_id"]: r for r in back.collect()}
    assert len(got) == 57
    for i in range(57):
        r = got[str(i)]  # tar keys are strings
        assert r["text"] == f"text {i} ü"
        assert json.loads(r["meta"]) == {"lang": f"lang{i % 3}"}
    assert back.rdd.getNumPartitions() == len(manifest)
