"""Regression matrix for contract_ext.load_events — the TIMESTAMP(NANOS)
events loader that cost round 2 an entire bench run.

Covers, per VERDICT r3 #2:
- a synthesized TIMESTAMP(NANOS) parquet (pyarrow) loads to a
  micros-precision ``timestamp`` column whose values match DuckDB's
  reading of the same file byte-for-byte (the oracle-parity contract);
- the nanosAsLong surface (BIGINT epoch-nanos) floors to micros —
  including pre-1970 negatives, where truncate-toward-zero would round
  UP and break parity (ADVICE r3);
- an unexpected ts dtype raises instead of silently producing NULLs
  (ADVICE r3).
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gedixr_spark.contract_ext import load_events

# epoch-nanos values with awkward sub-µs remainders: exact µs boundary,
# remainder just under/over 500 (round-half hazards), remainder 999,
# and pre-1970 negatives with nonzero remainders (floor ≠ truncate).
NANOS = [
    1_704_067_200_000_000_000,  # 2024-01-01T00:00:00 exactly
    1_704_067_200_000_000_499,
    1_704_067_200_000_000_500,
    1_704_067_200_000_000_999,
    1_704_067_261_123_456_789,
    -1_000_000_001,  # 1969-12-31T23:59:58.999999999
    -123_456_789,
]


def _floor_div(n: int, d: int) -> int:
    return n // d  # Python // floors — the reference semantics


def _write_nanos_parquet(path: str) -> None:
    t = pa.table(
        {
            "event_id": pa.array(range(len(NANOS)), pa.int64()),
            "ts": pa.array(NANOS, pa.timestamp("ns")),
        }
    )
    pq.write_table(t, path)


def _write_bigint_parquet(path: str) -> None:
    t = pa.table(
        {
            "event_id": pa.array(range(len(NANOS)), pa.int64()),
            "ts": pa.array(NANOS, pa.int64()),
        }
    )
    pq.write_table(t, path)


def _loaded_micros(spark, d) -> dict[int, int]:
    from pyspark.sql import functions as F

    df = load_events(spark, str(d))
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    return {r["event_id"]: r["us"] for r in rows}


def test_native_nanos_path_matches_duckdb(spark, tmp_path):
    """Whatever branch this Spark version takes on a real NANOS file,
    the loaded µs instants must equal DuckDB's reading of the SAME file
    for all POST-1970 values — that equality IS the driver's
    oracle-parity contract (every driver fixture is post-1970).

    Pre-1970 is a measured, genuine engine divergence: Spark's native
    NANOS→NTZ read FLOORS sub-µs remainders while DuckDB 1.0.0's
    parquet ns→µs conversion truncates toward zero. We pin both
    behaviors so a change in either engine shows up here first."""
    import duckdb

    _write_nanos_parquet(str(tmp_path / "events.parquet"))
    got = _loaded_micros(spark, tmp_path)

    con = duckdb.connect()
    oracle = dict(
        con.execute(
            "SELECT event_id, epoch_us(ts) FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        ).fetchall()
    )
    for i, ns in enumerate(NANOS):
        if ns >= 0:
            assert got[i] == oracle[i] == _floor_div(ns, 1000)
    # Spark floors everywhere (consistent with load_events' bigint path)
    assert got == {i: _floor_div(ns, 1000) for i, ns in enumerate(NANOS)}
    # DuckDB truncates toward zero pre-1970 (the pinned divergence)
    assert oracle[5] == -1_000_000 and oracle[6] == -123_456


def test_bigint_nanos_path_floors_not_truncates(spark, tmp_path):
    """The nanosAsLong surface: BIGINT epoch-nanos must FLOOR to µs.
    -1_000_000_001 ns → -1_000_001 µs (floor), not -1_000_000
    (truncate-toward-zero)."""
    _write_bigint_parquet(str(tmp_path / "events.parquet"))
    got = _loaded_micros(spark, tmp_path)
    assert got == {i: _floor_div(ns, 1000) for i, ns in enumerate(NANOS)}
    assert got[5] == -1_000_001  # the floor-vs-truncate witness


def test_unexpected_ts_dtype_raises(spark, tmp_path):
    t = pa.table(
        {
            "event_id": pa.array([0], pa.int64()),
            "ts": pa.array(["2024-01-01"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    with pytest.raises(TypeError, match="unexpected dtype"):
        load_events(spark, str(tmp_path))


def test_micros_precision_survives_utc_pin(spark, tmp_path):
    """Session TZ is pinned to UTC inside load_events; a wall-clock
    render of the floored instant must agree with the naive nanos."""
    _write_nanos_parquet(str(tmp_path / "events.parquet"))
    df = load_events(spark, str(tmp_path))
    row = df.filter("event_id = 4").collect()[0]
    assert row["ts"] == datetime.datetime(2024, 1, 1, 0, 1, 1, 123456)
