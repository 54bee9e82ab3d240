"""Footer-based per-file stats (r15 optimization): the commit path's
skipping-index stats come straight from the parquet footers the staged
write produced — zero Spark jobs, zero re-read of committed bytes —
and must be EXACTLY equal to the distributed stats job they replace
(Invariant 13: recorded bounds are exact, never approximate).
"""

import pyspark.sql.functions as F
import pytest

from gedixr_spark.sinks import versioned
from gedixr_spark.sinks.versioned import (
    _file_column_stats,
    _try_footer_stats,
    commit_append,
    init_versioned,
    read_versioned,
    read_where,
)


def _job_stats(monkeypatch, spark, path, names, cols):
    """The distributed stats job, with the footer fast path forced off."""
    monkeypatch.setattr(versioned, "_FOOTER_STATS_MAX_FILES", -1)
    try:
        return _file_column_stats(spark, path, names, cols)
    finally:
        monkeypatch.undo()


def _mixed_df(spark):
    rows = []
    for i in range(40):
        rows.append(
            (
                i - 7,  # negative and positive longs
                ("m" * 250 + f"{i:04d}") if i % 3 else ("A" * 300),  # long strings
                bool(i % 2),
                None if i % 4 == 0 else f"v{i:03d}",  # nullable string
            )
        )
    return spark.createDataFrame(
        rows, "k long, s string, b boolean, n string"
    ).coalesce(3)


def test_footer_stats_match_job_exactly(spark, tmp_path, monkeypatch):
    """Long untruncated strings, negative ints, booleans, nullable
    columns, multi-file commit: footer == job, bit for bit."""
    path = str(tmp_path / "t")
    init_versioned(spark, path)
    entry = commit_append(
        spark, path, _mixed_df(spark), stats_cols=["k", "s", "b", "n"]
    )
    names = entry["add"]
    assert len(names) >= 2
    fast = _try_footer_stats(path, names, ["k", "s", "b", "n"])
    assert fast is not None, "eligible commit must take the footer path"
    job = _job_stats(monkeypatch, spark, path, names, ["k", "s", "b", "n"])
    assert fast == job
    # the entry's recorded stats came from the fast path and agree too
    assert entry["stats"] == job
    # sanity on value shapes: full-length string bounds, exact rowcounts
    total = sum(st["__nrows"] for st in fast.values())
    assert total == 40
    smins = [st["s"][0] for st in fast.values() if st["s"][0] is not None]
    assert any(len(v) >= 250 for v in smins)


def test_footer_stats_all_null_column(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    init_versioned(spark, path)
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "k long, s string"
    ).coalesce(1)
    entry = commit_append(spark, path, df, stats_cols=["s", "k"])
    names = entry["add"]
    fast = _try_footer_stats(path, names, ["s", "k"])
    assert fast is not None
    job = _job_stats(monkeypatch, spark, path, names, ["s", "k"])
    assert fast == job
    assert all(st["s"] == [None, None] for st in fast.values())


def test_footer_stats_multi_row_group(spark, tmp_path, monkeypatch):
    """Bounds merge across row groups (min of mins / max of maxes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    init_versioned(spark, path)
    entry = commit_append(
        spark,
        path,
        spark.range(5).select(F.col("id").alias("k")),
        stats_cols=["k"],
    )
    # graft a hand-built 3-row-group file into data/ next to the commit
    name = "v00000001-manual-part-extra.parquet"
    tbl = pa.table({"k": pa.array([30, -9, 4, 17, 2, 55], pa.int64())})
    pq.write_table(tbl, f"{path}/data/{name}", row_group_size=2)
    assert pq.ParquetFile(f"{path}/data/{name}").metadata.num_row_groups == 3
    names = sorted(entry["add"] + [name])
    fast = _try_footer_stats(path, names, ["k"])
    assert fast is not None
    job = _job_stats(monkeypatch, spark, path, names, ["k"])
    assert fast == job
    assert fast[name]["k"] == [-9, 55]
    assert fast[name]["__nrows"] == 6


def test_footer_stats_bails_on_floats_and_job_answers(
    spark, tmp_path, monkeypatch
):
    """Float stats columns are outside the proven-exact set: the fast
    path declines and the job records them (end result identical to
    the pre-optimization engine)."""
    path = str(tmp_path / "t")
    init_versioned(spark, path)
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, -2.25)], "k long, f double"
    ).coalesce(1)
    entry = commit_append(spark, path, df, stats_cols=["f"])
    assert _try_footer_stats(path, entry["add"], ["f"]) is None
    st = next(iter(entry["stats"].values()))
    assert st["f"][0] == -2.25  # job ran and recorded real bounds
    assert st["__nrows"] == 3


def test_footer_stats_bails_on_missing_column(spark, tmp_path):
    path = str(tmp_path / "t")
    init_versioned(spark, path)
    entry = commit_append(
        spark, path, spark.range(3).select(F.col("id").alias("k"))
    )
    assert _try_footer_stats(path, entry["add"], ["nope"]) is None


def test_non_scalar_stats_cols_still_raise(spark, tmp_path):
    """The job path's ValueError contract survives the fast path."""
    path = str(tmp_path / "t")
    init_versioned(spark, path)
    df = spark.range(3).select(
        F.col("id").alias("k"), F.current_date().alias("d")
    )
    with pytest.raises(ValueError, match="JSON-scalar"):
        commit_append(spark, path, df, stats_cols=["d"])


def test_footer_stats_guards(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    init_versioned(spark, path)
    entry = commit_append(
        spark, path, spark.range(3).select(F.col("id").alias("k"))
    )
    names = entry["add"]
    assert _try_footer_stats(path, names, ["k"]) is not None
    monkeypatch.setattr(versioned, "_FOOTER_STATS_MAX_FILES", 0)
    assert _try_footer_stats(path, names, ["k"]) is None
    monkeypatch.undo()
    assert _try_footer_stats("s3://bucket/t", names, ["k"]) is None
    assert _try_footer_stats(path, ["ext/ernal.parquet"], ["k"]) is None


def test_pruned_read_equivalence_with_footer_stats(spark, tmp_path):
    """End to end: a read_where pruned read over footer-recorded stats
    returns exactly the rows of the unpruned snapshot filter."""
    path = str(tmp_path / "t")
    init_versioned(spark, path)
    df = (
        spark.range(400)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 16).cast("long").alias("bucket"),
        )
        .repartition(8, "bucket")
        .sortWithinPartitions("bucket")
    )
    commit_append(spark, path, df, stats_cols=["bucket"])
    pruned = read_where(spark, path, "bucket", 3, 5).filter(
        F.col("bucket").between(3, 5)
    )
    full = read_versioned(spark, path).filter(F.col("bucket").between(3, 5))
    assert sorted(pruned.collect()) == sorted(full.collect())


def test_footer_stats_string_size_ceiling(spark, tmp_path, monkeypatch):
    """r16 (r15 VERDICT #7): the string-exactness proof measured at its
    ceiling. parquet-mr OMITS chunk min/max when the combined bound
    size exceeds its 4096-byte statistics cap, so (a) ~1 KB values are
    still recorded untruncated and footer == job bit for bit, and
    (b) past the cap (~2 KB+ per bound) `has_min_max` is false and the
    footer path falls back to the job — exactness can never silently
    degrade to a truncated bound under the default writer conf."""
    for size, expect_fast in ((1024, True), (2048, False), (8192, False)):
        rows = [
            (i, chr(ord("a") + (i % 7)) * size + f"{i:05d}")
            for i in range(12)
        ]
        df = spark.createDataFrame(rows, "k long, s string").coalesce(2)
        path = str(tmp_path / f"t{size}")
        init_versioned(spark, path)
        entry = commit_append(spark, path, df, stats_cols=["s"])
        names = entry["add"]
        fast = _try_footer_stats(path, names, ["s"])
        job = _job_stats(monkeypatch, spark, path, names, ["s"])
        if expect_fast:
            assert fast is not None and fast == job
            assert any(len(v["s"][0]) > 1000 for v in fast.values())
        else:
            assert fast is None  # writer omitted stats → job path
            # and the job path recorded the true full-length bounds
            assert all(len(v["s"][0]) > size for v in job.values())


def test_footer_stats_string_fallback_under_truncation_conf(
    spark, tmp_path, monkeypatch
):
    """r16 (r15 ADVICE): when parquet.statistics.truncate.length is set
    on the writer conf, string chunk stats may be truncated PREFIXES —
    indistinguishable from exact bounds in pyarrow. The commit path
    must then route string stats through the job (which reads values,
    not footers) so recorded bounds stay exact; int columns stay on
    the footer path (never truncated)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("parquet.statistics.truncate.length") is None
    hconf.set("parquet.statistics.truncate.length", "16")
    try:
        rows = [(i, "z" * 64 + f"{i:04d}") for i in range(10)]
        df = spark.createDataFrame(rows, "k long, s string").coalesce(2)
        path = str(tmp_path / "t")
        init_versioned(spark, path)
        entry = commit_append(spark, path, df, stats_cols=["k", "s"])
        names = entry["add"]
        # the guard: strings are ineligible under the conf...
        assert _try_footer_stats(path, names, ["s"], allow_strings=False) is None
        # ...ints remain eligible and exact
        fast_k = _try_footer_stats(path, names, ["k"], allow_strings=False)
        assert fast_k is not None
        # and the COMMIT recorded exact (job-path) string bounds: they
        # must equal true min/max of the written values, full length
        stats = versioned._file_column_stats(spark, path, names, ["s"])
        vals = sorted(r[1] for r in rows)
        allmn = min(v["s"][0] for v in stats.values())
        allmx = max(v["s"][1] for v in stats.values())
        assert (allmn, allmx) == (vals[0], vals[-1])
        assert len(allmn) == 68  # untruncated, not a 16-byte prefix
    finally:
        hconf.unset("parquet.statistics.truncate.length")
