"""Streaming dedup within watermark (exactly-once ingestion primitive)."""

import datetime

from gedixr_spark.streaming import dedup as sd
from gedixr_spark.streaming import events as st


def _write_stream_input(spark, tmp_path):
    ts0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, ts0, "the cat sat"),
        (1, ts0 + datetime.timedelta(minutes=1), "the cat sat"),      # id replay
        (2, ts0 + datetime.timedelta(minutes=2), "THE  CAT  SAT"),    # content dup of 1
        (3, ts0 + datetime.timedelta(minutes=3), "something else"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "text"])
    p = str(tmp_path / "in")
    df.write.parquet(p)
    return p, df.schema


def test_streaming_dedup_by_id(spark, tmp_path):
    p, schema = _write_stream_input(spark, tmp_path)
    stream = st.read_event_stream(spark, p, schema)
    out = sd.streaming_dedup_by_id(stream)
    rows = st.run_available_now(out, "t_dedup_id", output_mode="append")
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]  # replay of 1 dropped


def test_streaming_dedup_by_content(spark, tmp_path):
    p, schema = _write_stream_input(spark, tmp_path)
    stream = st.read_event_stream(spark, p, schema)
    out = sd.streaming_dedup_by_content(stream, "text")
    rows = st.run_available_now(out, "t_dedup_content", output_mode="append")
    texts = sorted(r["text"].lower().split()[0] for r in rows)
    assert len(rows) == 2  # one survivor per normalized content
    assert "__content_key" not in rows[0].asDict()


def test_streaming_incremental_dedup_across_batches(spark, tmp_path):
    """Cross-batch dedup against the persisted signature store: batch 2
    contains an exact copy and a near-copy of batch-1 docs plus fresh
    docs; only the fresh docs survive, the store grows by exactly the
    survivors, and historical TEXT is never read (store carries
    signatures only)."""
    landing = tmp_path / "landing"
    store = str(tmp_path / "store")
    out = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely different content about spark engines here"),
        ],
        "doc_id long, text string",
    )
    b1.write.mode("append").parquet(str(landing))
    schema = b1.schema

    def drain():
        q = sd.streaming_incremental_dedup_query(
            st.read_event_stream(spark, str(landing), schema),
            store, out, ckpt, threshold=0.4, k=4, bands=2,
            available_now=True,
        )
        q.awaitTermination()

    drain()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {0, 1}

    b2 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # exact dup
            (11, "the quick brown fox jumps over the lazy dog tonight"),  # near dup
            (12, "entirely novel text that matches nothing at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    b2.write.mode("append").parquet(str(landing))
    drain()

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {0, 1, 12}, kept
    # store holds signatures for every survivor, and only signature
    # columns (no text!)
    s = spark.read.parquet(store)
    assert {r["doc_id"] for r in s.collect()} == {0, 1, 12}
    assert "text" not in s.columns
