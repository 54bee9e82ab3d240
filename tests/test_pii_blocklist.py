"""Tests for PII audit/redaction and blocklist filtering."""

from pyspark.sql import functions as F

from gedixr_spark.operators import text


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.io and c.d@e.org plus 192.168.0.1"), (2, "clean text")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text.pii_features(df).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_ipv4"] == 1
    assert rows[2]["n_email"] == 0 and rows[2]["n_ipv4"] == 0


def test_redact_email_before_ip(spark):
    # an address with an embedded dotted quad redacts as ONE email,
    # not as a mangled ip fragment (email pattern runs first)
    df = spark.createDataFrame(
        [(1, "x user@10.0.0.12.com y 10.1.2.3")], ["doc_id", "text"]
    )
    out = text.redact_pii(df).collect()[0]["text_redacted"]
    assert out == "x <EMAIL> y <IPV4>"


def test_redact_keeps_original_column(spark):
    df = spark.createDataFrame([(1, "a@b.co")], ["doc_id", "text"])
    row = text.redact_pii(df).collect()[0]
    assert row["text"] == "a@b.co" and row["text_redacted"] == "<EMAIL>"


def test_blocklist_drops_and_keeps(spark):
    df = spark.createDataFrame(
        [(1, "good.com"), (2, "bad.com"), (3, "bad.com"), (4, "fine.org")],
        ["doc_id", "source"],
    )
    out = text.blocklist_filter(df, ["bad.com", "absent.net"])
    assert {r["doc_id"] for r in out.collect()} == {1, 4}


def test_blocklist_plan_is_broadcast_anti_join(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    out = text.blocklist_filter(df, ["b"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
