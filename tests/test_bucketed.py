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


# --- bucketing × sequence packing composition (VERDICT r4 item #5) -----
# Pay the pack_group shuffle ONCE at write time: a table bucketed by
# pack_group already satisfies pack_sequences' groupBy clustering, so
# the whole packing pass plans with zero Exchange; materialize_packed
# against doc_id-bucketed docs additionally drops the docs-side join
# exchange, so document text only moves in the final (pack_group,
# seq_id) assembly shuffle.


def _counts_with_group(spark, n=300, n_groups=8):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13 + 1).alias("n_tokens"),
        F.pmod(F.col("id"), F.lit(n_groups)).alias("pack_group"),
    )


def test_pack_sequences_on_bucketed_table_has_no_exchange(spark, warehouse):
    from gedixr_spark.operators.packing import pack_sequences

    counts = _counts_with_group(spark)
    bucketed.write_bucketed(counts, "bktest.counts_bg", "pack_group", 8)
    src = bucketed.read_table(spark, "bktest.counts_bg")
    packed = pack_sequences(src, budget=32, group_col="pack_group")
    assert not bucketed.plan_has_exchange(packed), (
        "bucketed-by-pack_group input must pack with zero shuffle"
    )
    # control: same frame, derived group → needs the exchange
    plain = pack_sequences(counts, budget=32, n_groups=8)
    assert bucketed.plan_has_exchange(plain)


def test_bucketed_pack_results_match_plain(spark, warehouse):
    from gedixr_spark.operators.packing import pack_sequences

    counts = _counts_with_group(spark)
    src = bucketed.read_table(spark, "bktest.counts_bg")
    got = sorted(
        map(tuple, pack_sequences(src, budget=32, group_col="pack_group").collect())
    )
    want = sorted(map(tuple, pack_sequences(counts, budget=32, n_groups=8).collect()))
    assert got == want and len(got) == 300


def test_materialize_against_bucketed_docs_drops_join_exchange(spark, warehouse):
    from gedixr_spark.operators.packing import materialize_packed, pack_sequences

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id")).alias("text"),
    )
    bucketed.write_bucketed(docs, "bktest.docs_text_b", "doc_id", 8)
    src = bucketed.read_table(spark, "bktest.counts_bg")
    packed = pack_sequences(src, budget=32, group_col="pack_group")

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )

    mat_bucketed = materialize_packed(packed, bucketed.read_table(spark, "bktest.docs_text_b"))
    mat_plain = materialize_packed(pack_sequences(_counts_with_group(spark), budget=32, n_groups=8), docs)
    # bucketed pipeline: pack shuffle gone AND docs-side join exchange
    # gone — strictly fewer exchanges than the plain pipeline
    assert n_exchanges(mat_bucketed) < n_exchanges(mat_plain)
    # and identical output
    got = sorted((r["pack_group"], r["seq_id"], r["seq_text"]) for r in mat_bucketed.collect())
    want = sorted((r["pack_group"], r["seq_id"], r["seq_text"]) for r in mat_plain.collect())
    assert got == want
