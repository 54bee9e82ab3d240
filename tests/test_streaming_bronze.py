"""Bronze landing stream: exactly-once parquet append with date
partitions, including crash-resume via checkpoint."""

import datetime

from gedixr_spark.streaming.bronze import bronze_landing_query
from gedixr_spark.streaming.events import read_event_stream


def _write_batch(spark, d, start_id, day):
    ts = datetime.datetime(2024, 1, day)
    rows = [(start_id + i, ts + datetime.timedelta(minutes=i), 1, "click", 1.0)
            for i in range(5)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    df.write.mode("append").parquet(str(d))
    return df.schema


def test_bronze_landing_partitions_and_resumes(spark, tmp_path):
    landing = tmp_path / "landing"
    out = tmp_path / "bronze"
    ckpt = tmp_path / "ckpt"
    schema = _write_batch(spark, landing, 0, day=1)

    q = bronze_landing_query(
        read_event_stream(spark, str(landing), schema),
        str(out), str(ckpt), available_now=True,
    )
    q.awaitTermination()
    first = spark.read.parquet(str(out))
    assert first.count() == 5
    assert (out / "acq_date=2024-01-01").exists()  # date partitioning

    # new files land; a RESUMED query (same checkpoint) must process
    # only the delta — no duplicates of batch 1
    _write_batch(spark, landing, 100, day=2)
    q2 = bronze_landing_query(
        read_event_stream(spark, str(landing), schema),
        str(out), str(ckpt), available_now=True,
    )
    q2.awaitTermination()
    final = spark.read.parquet(str(out))
    assert final.count() == 10  # 5 + 5, exactly-once
    assert final.select("event_id").distinct().count() == 10
    assert (out / "acq_date=2024-01-02").exists()
