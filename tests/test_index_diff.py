"""Inverted index + boolean search (DuckDB differential) and table
diff / fingerprint (order-independence, CDC composition)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.diff import table_diff, table_fingerprint
from gedixr_spark.operators.text import build_inverted_index, search_index


# ------------------------------------------------------- inverted index


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def index(docs):
    return build_inverted_index(docs).localCheckpoint()


def test_index_postings_match_duckdb(index, sf_dir):
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in index.filter(F.col("term").isin(["the", "data"])).collect()
    }
    for term in got:
        want = duckdb.sql(
            f"""
            SELECT list_sort(list(DISTINCT doc_id)) FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                FROM '{sf_dir}/documents.parquet'
            ) WHERE t = '{term}'
            """
        ).fetchone()[0]
        assert got[term][1] == want
        assert got[term][0] == len(want)


def test_search_all_matches_duckdb(index, sf_dir):
    got = sorted(r["doc_id"] for r in search_index(index, ["the", "data"]).collect())
    want = [
        r[0]
        for r in duckdb.sql(
            f"""
            SELECT doc_id FROM '{sf_dir}/documents.parquet'
            WHERE list_contains(string_split(lower(text), ' '), 'the')
              AND list_contains(string_split(lower(text), ' '), 'data')
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want


def test_search_any_is_union(index, docs):
    all_m = {r["doc_id"] for r in search_index(index, ["the", "data"], "all").collect()}
    any_m = {r["doc_id"] for r in search_index(index, ["the", "data"], "any").collect()}
    assert all_m <= any_m
    only_the = {r["doc_id"] for r in search_index(index, ["the"]).collect()}
    assert only_the <= any_m


def test_search_validates(index):
    with pytest.raises(ValueError, match="mode"):
        search_index(index, ["x"], mode="none")
    with pytest.raises(ValueError, match="non-empty"):
        search_index(index, [])


def test_search_case_insensitive_and_dedup_terms(index):
    a = sorted(r["doc_id"] for r in search_index(index, ["The", "THE", "the"]).collect())
    b = sorted(r["doc_id"] for r in search_index(index, ["the"]).collect())
    assert a == b


# --------------------------------------------------- diff / fingerprint


def test_fingerprint_is_order_and_partition_independent(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(500)], "id long, v string"
    )
    a = table_fingerprint(df)
    b = table_fingerprint(df.orderBy(F.desc("id")).repartition(7))
    assert a == b
    assert a["n_rows"] == 500


def test_fingerprint_detects_changes(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    changed = spark.createDataFrame([(1, "a"), (2, "X")], "id long, v string")
    dup_added = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b")], "id long, v string"
    )
    fp = table_fingerprint(base)
    assert table_fingerprint(changed) != fp
    assert table_fingerprint(dup_added) != fp
    # column subset restricts sensitivity
    assert table_fingerprint(changed, ["id"]) == table_fingerprint(base, ["id"])


def test_table_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, v string, x double"
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "CHANGED", 3.0), (4, "d", 4.0)], "id long, v string, x double"
    )
    got = {r["id"]: r["op"] for r in table_diff(old, new, ["id"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged → absent


def test_table_diff_validates(spark):
    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="at least one key"):
        table_diff(a, a, [])
    with pytest.raises(ValueError, match="schemas differ"):
        table_diff(a, b, ["id"])


def test_diff_validates_a_cdc_merge(spark, tmp_path):
    """Composition: merge_upsert's effect is exactly what table_diff
    reports — the audit loop for CDC."""
    from gedixr_spark.sinks.merge import merge_upsert

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    ).write.parquet(path)
    before = spark.read.parquet(path).localCheckpoint()
    updates = spark.createDataFrame([(3, "NEW"), (100, "ADD")], "id long, v string")
    merge_upsert(spark, path, updates, keys=["id"])
    after = spark.read.parquet(path)
    got = {r["id"]: r["op"] for r in table_diff(before, after, ["id"]).collect()}
    assert got == {3: "changed", 100: "added"}


# ------------------------------------------------------- phrase search


def test_phrase_search_exact_fixture(spark):
    from gedixr_spark.operators.text import build_positional_index, phrase_search

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "quick brown shoes and the quick brown hat"),
            (2, "brown quick reversed"),
            (3, "the quick  brown fox"),  # double space: tokens() drops empties
        ],
        "doc_id long, text string",
    )
    idx = build_positional_index(docs)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(idx, ["quick", "brown"]).collect()
    }
    assert got == {0: 1, 1: 2, 3: 1}  # 2 not matched (reversed)
    three = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(idx, ["the", "quick", "brown"]).collect()
    }
    assert three == {0: 1, 1: 1, 3: 1}


def test_phrase_search_repeated_word(spark):
    from gedixr_spark.operators.text import build_positional_index, phrase_search

    docs = spark.createDataFrame(
        [(0, "ha ha ha"), (1, "ha no ha")], "doc_id long, text string"
    )
    idx = build_positional_index(docs)
    got = {
        r["doc_id"]: r["n_matches"] for r in phrase_search(idx, ["ha", "ha"]).collect()
    }
    assert got == {0: 2}  # overlapping occurrences both count


def test_phrase_search_matches_duckdb_substring(spark, docs):
    """On the real documents table: single-space-tokenized docs let a
    string-level check stand in as the oracle — phrase hit iff
    ' a b ' occurs in the padded lowercase text."""
    from gedixr_spark.operators.text import build_positional_index, phrase_search

    idx = build_positional_index(docs)
    got = sorted(
        r["doc_id"] for r in phrase_search(idx, ["the", "data"]).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.filter(
            F.concat(F.lit(" "), F.lower("text"), F.lit(" ")).contains(" the data ")
        ).collect()
    )
    assert got == want


def test_phrase_search_validates(spark):
    from gedixr_spark.operators.text import build_positional_index, phrase_search

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    idx = build_positional_index(docs)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        phrase_search(idx, [])
