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
