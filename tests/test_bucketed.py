"""Bucketed-table layout: joins and aggregations on the bucket keys
must run WITHOUT a shuffle Exchange on the bucketed sides."""

import pytest
from pyspark.sql import functions as F

from gedixr_spark.sinks import bucketed


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # managed tables land in spark.sql.warehouse.dir; local session
    # already has one (spark-warehouse under cwd) — just namespace it.
    # Disable auto-broadcast: bucketing targets the big⋈big case (at
    # 100 TB neither side broadcasts); with tiny test tables the
    # planner would otherwise pick BroadcastHashJoin and skip the
    # bucketed read entirely.
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text for doc "), F.col("id")).alias("text"),
        (F.col("id") % 7).alias("grp"),
    )


def test_bucketed_join_has_no_exchange(spark, warehouse):
    docs = _docs(spark)
    sigs = docs.select("doc_id", F.md5("text").alias("sig"))
    bucketed.write_bucketed(docs, "bktest.docs_b", "doc_id", 4, sort_keys="doc_id")
    bucketed.write_bucketed(sigs, "bktest.sigs_b", "doc_id", 4, sort_keys="doc_id")

    a = bucketed.read_table(spark, "bktest.docs_b")
    b = bucketed.read_table(spark, "bktest.sigs_b")
    joined = a.join(b, "doc_id")
    assert not bucketed.plan_has_exchange(joined)
    assert joined.count() == 200

    # same join on NON-bucketed frames shuffles (control)
    control = docs.join(sigs, "doc_id")
    assert bucketed.plan_has_exchange(control)


def test_bucketed_groupby_has_no_exchange(spark, warehouse):
    a = bucketed.read_table(spark, "bktest.docs_b")
    agg = a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert not bucketed.plan_has_exchange(agg)
    assert agg.count() == 200


def test_bucketed_join_correctness_matches_plain(spark, warehouse):
    docs = _docs(spark)
    sigs = docs.select("doc_id", F.md5("text").alias("sig"))
    a = bucketed.read_table(spark, "bktest.docs_b")
    b = bucketed.read_table(spark, "bktest.sigs_b")
    got = sorted(
        (r["doc_id"], r["sig"]) for r in a.join(b, "doc_id").select("doc_id", "sig").collect()
    )
    want = sorted(
        (r["doc_id"], r["sig"]) for r in docs.join(sigs, "doc_id").select("doc_id", "sig").collect()
    )
    assert got == want


def test_mismatched_bucket_counts_still_correct(spark, warehouse):
    """Different bucket counts: plan may reshuffle one side (or
    coalesce buckets), but results must be identical."""
    docs = _docs(spark)
    bucketed.write_bucketed(
        docs.select("doc_id", "grp"), "bktest.docs_b8", "doc_id", 8
    )
    a = bucketed.read_table(spark, "bktest.docs_b8")
    b = bucketed.read_table(spark, "bktest.sigs_b")  # 4 buckets
    assert a.join(b, "doc_id").count() == 200
