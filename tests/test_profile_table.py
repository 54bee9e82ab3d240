"""profile_table: one-pass column census. Exact facets (counts, nulls,
min/max, mean) are checked against DuckDB on the documents table; the
single-job claim is checked by plan (one Aggregate pair, one scan).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.stats import profile_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def prof(docs):
    return {r["column"]: r for r in profile_table(docs).collect()}


def test_profiles_every_column(docs, prof):
    assert set(prof) == set(docs.columns)


def test_exact_facets_match_duckdb(prof, sf_dir):
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT count(*), sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
               min(doc_id), max(doc_id), avg(doc_id),
               stddev_samp(doc_id), count(DISTINCT lang)
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchone()
    did = prof["doc_id"]
    assert did["n_rows"] == want[0]
    assert prof["lang"]["n_nulls"] == (want[1] or 0)
    assert int(did["min_value"]) == want[2]
    assert int(did["max_value"]) == want[3]
    assert did["mean"] == pytest.approx(want[4])
    assert did["stddev"] == pytest.approx(want[5])
    # HLL++ estimate close to exact on a small-cardinality column
    assert prof["lang"]["approx_distinct"] == pytest.approx(want[6], rel=0.1)


def test_dtype_and_nonnumeric_facets(prof, docs):
    dtypes = dict(docs.dtypes)
    for c, row in prof.items():
        assert row["dtype"] == dtypes[c]
    assert prof["text"]["mean"] is None and prof["text"]["stddev"] is None
    assert prof["text"]["min_value"] is not None  # strings still get min/max


def test_nulls_counted(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a"), (None, "b")], "x int, s string"
    )
    p = {r["column"]: r for r in profile_table(df).collect()}
    assert p["x"]["n_nulls"] == 1 and p["s"]["n_nulls"] == 1
    assert p["x"]["n_rows"] == 3


def test_complex_columns_census_only(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "id int, vec array<double>"
    )
    p = {r["column"]: r for r in profile_table(df).collect()}
    assert p["vec"]["n_nulls"] == 1
    assert p["vec"]["min_value"] is None and p["vec"]["mean"] is None
    assert p["vec"]["approx_distinct"] >= 1


def test_single_scan_single_aggregate(docs):
    """The profiler's cost contract: one scan, one partial/final
    aggregate pair, no join/union of per-column jobs."""
    plan = profile_table(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Union" not in plan and "Join" not in plan, plan


def test_math_sanity(prof):
    d = prof["doc_id"]
    assert float(d["min_value"]) <= d["mean"] <= float(d["max_value"])
    assert d["stddev"] is not None and math.isfinite(d["stddev"])
