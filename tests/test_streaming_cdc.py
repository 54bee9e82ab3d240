"""Streaming table_changes source (r13 VERDICT #4): the micro-batch
CDC reader on the cursor protocol. Pins the three 'Done =' properties:

1. BATCH TWIN: the concatenation of a stream's micro-batches equals
   one batch ``table_changes`` over the same range, change for change;
2. EXACTLY-ONCE across a mid-stream crash: the cursor CAS holds the
   watermark, the ledger dedups the mirror's sub-commits — a crash
   between them (the worst spot) never double-applies;
3. BOUNDED per-batch plans: every cycle's version range respects
   ``max_versions``.

Extension-layer surface (no reference parity — the reference engine
has no versioned tables or change feeds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vt():
    from gedixr_spark.sinks import versioned as vt
    return vt


def _mk(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _source_lifecycle(spark, vt, t):
    vt.init_versioned(spark, t)
    vt.commit_append(spark, t, _mk(spark, [(i, f"a{i}") for i in range(4)]))
    vt.commit_upsert(spark, t, _mk(spark, [(1, "up1"), (9, "new9")]), keys=["k"])
    vt.commit_delete(spark, t, F.col("k") == 2, mode="cow")
    vt.commit_append(spark, t, _mk(spark, [(20, "b20")]))
    vt.commit_delete(spark, t, F.col("k") == 0, mode="dv")
    vt.commit_upsert(spark, t, _mk(spark, [(9, "up9")]), keys=["k"])
    return vt.table_history(spark, t)[-1]["version"]


def _rows(df):
    # key=repr: tuples may carry None (NULL-backfilled evolution cols)
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)) for r in df.collect()),
        key=repr,
    )


def test_stream_of_micro_batches_equals_one_batch_read(spark, tmp_path):
    from gedixr_spark.streaming.cdc import stream_table_changes

    vt = _vt()
    t = str(tmp_path / "src")
    tip = _source_lifecycle(spark, vt, t)

    batches: list = []
    ranges: list = []

    def sink(df, frm, to):
        batches.extend(_rows(df))
        ranges.append((frm, to))

    out = stream_table_changes(
        spark, t, "twin", sink, max_versions=2
    ).process_available()
    assert out["batches"] >= 3 and not out["truncated"]
    assert out["to_version"] == tip
    # bounded plans: no cycle exceeded max_versions
    assert all(to - frm <= 2 for frm, to in ranges)
    # contiguous, gap-free coverage of (0, tip]
    assert ranges[0][0] == 0 and ranges[-1][1] == tip
    assert all(a[1] == b[0] for a, b in zip(ranges, ranges[1:]))
    # THE batch twin
    assert sorted(batches) == _rows(vt.table_changes(spark, t, 0, tip))


def test_incremental_cycles_only_see_new_commits(spark, tmp_path):
    from gedixr_spark.streaming.cdc import stream_table_changes

    vt = _vt()
    t = str(tmp_path / "src")
    vt.init_versioned(spark, t)
    vt.commit_append(spark, t, _mk(spark, [(1, "a")]))
    seen: list = []
    stream = stream_table_changes(
        spark, t, "inc", lambda df, f, to: seen.extend(_rows(df))
    )
    stream.process_available()
    n1 = len(seen)
    assert n1 == 1
    # nothing new: the next drain consumes zero batches
    assert stream.process_available()["batches"] == 0
    assert len(seen) == n1
    vt.commit_append(spark, t, _mk(spark, [(2, "b")]))
    stream.process_available()
    assert len(seen) == n1 + 1


def test_mirror_equals_source_and_resumes(spark, tmp_path):
    from gedixr_spark.streaming.cdc import mirror_table_changes

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _source_lifecycle(spark, vt, src)
    mirror_table_changes(spark, src, dst, keys=["k"])
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))
    # more source commits -> incremental mirror stays equal
    vt.commit_upsert(spark, src, _mk(spark, [(20, "rewrit")]), keys=["k"])
    vt.commit_delete(spark, src, F.col("k") == 9, mode="cow")
    out = mirror_table_changes(spark, src, dst, keys=["k"])
    assert out["batches"] >= 1
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))
    # idle re-run: no-op, still equal
    assert mirror_table_changes(spark, src, dst, keys=["k"])["batches"] == 0
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))


def test_crash_between_mirror_subcommits_is_exactly_once(spark, tmp_path):
    """The worst crash spot: after the range's upsert sub-commit, before
    its delete sub-commit and before the cursor advance. Resume must
    (a) re-deliver the same range, (b) no-op the already-applied upsert
    via the ledger, (c) apply the delete once — final mirror ≡ source."""
    from gedixr_spark.streaming.cdc import (
        mirror_changes_batch, mirror_table_changes, stream_table_changes,
    )

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(spark, src, _mk(spark, [(1, "a"), (2, "b")]))
    vt.commit_delete(spark, src, F.col("k") == 2, mode="cow")
    vt.init_versioned(spark, dst)

    calls = {"n": 0}

    def crashing_sink(df, frm, to):
        calls["n"] += 1
        # apply the upsert half for real, then die before the delete
        from gedixr_spark.streaming.cdc import _final_changes_per_key
        from gedixr_spark.streaming.bronze import upsert_stream_batch

        final = _final_changes_per_key(df, ["k"])
        ups = final.filter(F.col("_change_type") != "delete").drop(
            "_change_type", "_commit_version"
        )
        if ups.limit(1).count():
            upsert_stream_batch(
                ups, dst, batch_id=f"mirror:{frm}-{to}:u", keys=["k"]
            )
        raise RuntimeError("crash before delete sub-commit + cursor")

    stream = stream_table_changes(
        spark, src, "mirror", crashing_sink, max_versions=None
    )
    with pytest.raises(RuntimeError, match="crash before"):
        stream.process_once()
    assert calls["n"] == 1
    # cursor did NOT advance: the mirror run re-delivers the range
    from gedixr_spark.sinks.cursor import cursor_position

    assert cursor_position(spark, src, "mirror") is None
    n_versions_before = len(vt.table_history(spark, dst))
    mirror_table_changes(spark, src, dst, keys=["k"], max_versions=None)
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))
    # the replayed upsert no-opped (ledger): exactly ONE delete-side
    # commit landed on resume, no duplicate upsert commit
    hist = vt.table_history(spark, dst)
    n_upserts = sum(1 for e in hist if e["op"] == "upsert")
    assert n_upserts == 1, [e["op"] for e in hist]
    assert len(hist) == n_versions_before + 1


def test_mirror_forwards_additive_evolution(spark, tmp_path):
    from gedixr_spark.streaming.cdc import mirror_table_changes

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(spark, src, _mk(spark, [(1, "a")]))
    mirror_table_changes(spark, src, dst, keys=["k"])
    vt.commit_append(
        spark, src, _mk(spark, [(2, "b", "x")], "k long, v string, c1 string")
    )
    mirror_table_changes(spark, src, dst, keys=["k"])
    got = _rows(vt.read_versioned(spark, dst))
    assert got == _rows(vt.read_versioned(spark, src))
    assert ("c1" in vt.read_versioned(spark, dst).columns)


def test_resume_after_crash_with_grown_tip_replays_exact_range(spark, tmp_path):
    """r14 'what's wrong' #4: crash AFTER both sub-commits landed but
    BEFORE the cursor CAS, then the SOURCE ADVANCES before the resume.
    The resume must recover the crashed range from the mirror's ledger
    and replay exactly IT (no-op via ledger ids), then consume the new
    commits as their own range — never one widened range whose upsert
    re-applies already-mirrored keys as a duplicate commit."""
    import re

    from gedixr_spark.sinks.cursor import cursor_position
    from gedixr_spark.streaming.cdc import (
        mirror_changes_batch, mirror_table_changes, stream_table_changes,
    )

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(spark, src, _mk(spark, [(1, "a"), (2, "b")]))
    vt.commit_upsert(spark, src, _mk(spark, [(2, "b2")]), keys=["k"])
    tip_at_crash = vt.table_history(spark, src)[-1]["version"]
    vt.init_versioned(spark, dst)

    def crashing_sink(df, frm, to):
        # the full apply lands; only the cursor CAS is lost
        mirror_changes_batch(df, dst, ["k"], frm, to, "mirror")
        raise RuntimeError("crash before cursor CAS")

    with pytest.raises(RuntimeError, match="crash before cursor"):
        stream_table_changes(
            spark, src, "mirror", crashing_sink, max_versions=None
        ).process_once()
    assert cursor_position(spark, src, "mirror") is None

    # the source advances BETWEEN the crash and the resume
    vt.commit_append(spark, src, _mk(spark, [(3, "c")]))

    mirror_table_changes(spark, src, dst, keys=["k"], max_versions=None)
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))

    # ledger ranges partition the consumed span: the crashed range
    # replayed as ITSELF, the post-crash commit landed as its own
    # range — no overlapping/widened range exists
    spans = sorted(
        tuple(map(int, m.groups()))
        for bid in vt.seen_stream_batch_ids(spark, dst)
        if (m := re.match(r"^mirror:(\d+)-(\d+):u$", str(bid)))
    )
    src_tip = vt.table_history(spark, src)[-1]["version"]
    assert spans == [(0, tip_at_crash), (tip_at_crash, src_tip)], spans
    # and the mirror's own change feed records key 1 exactly once —
    # a widened-range replay would have re-upserted it
    dst_tip = vt.table_history(spark, dst)[-1]["version"]
    feed = vt.table_changes(spark, dst, 0, dst_tip)
    k1 = feed.filter(
        (F.col("k") == 1) & (F.col("_change_type") != "update_preimage")
    ).count()
    assert k1 == 1


def test_mirror_batch_sizing_is_one_action(spark, tmp_path):
    """The per-cycle sizing discipline (r14 'what's wrong' #3): one
    aggregate on the cached final frame decides both sub-commits —
    not limit(1).count() + count() per side (4 actions)."""
    from gedixr_spark.streaming import cdc as cdc_mod

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(spark, src, _mk(spark, [(1, "a"), (2, "b")]))
    vt.commit_delete(spark, src, F.col("k") == 2, mode="cow")
    vt.init_versioned(spark, dst)

    from unittest import mock

    calls = {"n": 0}
    orig = type(
        vt.read_versioned(spark, src).agg(F.count(F.lit(1)))
    ).collect

    changes = vt.table_changes(spark, src, 0)

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    with mock.patch(
        "pyspark.sql.classic.dataframe.DataFrame.collect",
        counting_collect,
    ):
        cdc_mod.mirror_changes_batch(changes, dst, ["k"], 0, 2, "m1")
    # one sizing aggregate + whatever the sub-commits themselves
    # collect; the former 4 extra sizing actions are gone. Bound the
    # TOTAL so a future sizing regression trips this.
    assert calls["n"] <= 8, calls["n"]


def test_mirror_forwards_rename_widen_drop(spark, tmp_path):
    """r14 'what's missing' #5: the mirror replays the source's
    metadata-only schema ops per range — rename, widen, drop — so the
    replica tracks FULL schema evolution, not just additive."""
    from gedixr_spark.streaming.cdc import mirror_table_changes

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(
        spark, src,
        spark.createDataFrame([(1, "a", 7), (2, "b", 8)],
                              "k long, v string, n int"),
    )
    mirror_table_changes(spark, src, dst, keys=["k"])

    # rename + a data commit in one range
    vt.rename_column(spark, src, "v", "w")
    vt.commit_upsert(
        spark, src,
        spark.createDataFrame([(2, "B", 9)], "k long, w string, n int"),
        keys=["k"],
    )
    mirror_table_changes(spark, src, dst, keys=["k"])
    assert sorted(vt.read_versioned(spark, dst).columns) == ["k", "n", "w"]
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))

    # widen n int -> bigint, then a wide value lands
    vt.widen_column(spark, src, "n", "bigint")
    vt.commit_upsert(
        spark, src,
        spark.createDataFrame([(1, "A", 2**40)], "k long, w string, n long"),
        keys=["k"],
    )
    mirror_table_changes(spark, src, dst, keys=["k"])
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))

    # drop w
    vt.drop_column(spark, src, "w")
    vt.commit_append(
        spark, src, spark.createDataFrame([(5, 5)], "k long, n long")
    )
    mirror_table_changes(spark, src, dst, keys=["k"])
    assert sorted(vt.read_versioned(spark, dst).columns) == ["k", "n"]
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))


def test_mirror_add_then_rename_within_one_range(spark, tmp_path):
    """A column added AND renamed inside a single consumed range: the
    mirror never saw the intermediate name — the rename forward skips
    (neither name present) and the additive diff adds the FINAL name."""
    from gedixr_spark.streaming.cdc import mirror_table_changes

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(spark, src, _mk(spark, [(1, "a")]))
    mirror_table_changes(spark, src, dst, keys=["k"])

    vt.add_column(spark, src, "c0", "string")
    vt.commit_append(
        spark, src,
        spark.createDataFrame([(2, "b", "x")], "k long, v string, c0 string"),
    )
    vt.rename_column(spark, src, "c0", "cz")
    mirror_table_changes(spark, src, dst, keys=["k"], max_versions=None)
    assert "cz" in vt.read_versioned(spark, dst).columns
    assert "c0" not in vt.read_versioned(spark, dst).columns
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))


def test_mirror_rename_range_crash_replay_is_idempotent(spark, tmp_path):
    """Crash after a rename-containing range fully applied but before
    the cursor CAS; the source advances; the resume re-forwards the
    range's schema ops as no-ops and replays the exact range."""
    from gedixr_spark.sinks.cursor import cursor_position
    from gedixr_spark.streaming.cdc import (
        forward_schema_ops, mirror_changes_batch, mirror_table_changes,
        stream_table_changes,
    )

    vt = _vt()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(spark, src, _mk(spark, [(1, "a"), (2, "b")]))
    # establish the mirror under the OLD name, so the rename range
    # genuinely has something to forward
    mirror_table_changes(spark, src, dst, keys=["k"])
    vt.rename_column(spark, src, "v", "w")
    vt.commit_upsert(
        spark, src,
        spark.createDataFrame([(2, "B")], "k long, w string"), keys=["k"],
    )

    def crashing_sink(df, frm, to):
        forward_schema_ops(spark, src, dst, frm, to)
        mirror_changes_batch(df, dst, ["k"], frm, to, "mirror")
        raise RuntimeError("crash before cursor CAS")

    pos_before = cursor_position(spark, src, "mirror")
    with pytest.raises(RuntimeError, match="crash before cursor"):
        stream_table_changes(
            spark, src, "mirror", crashing_sink, max_versions=None
        ).process_once()
    assert cursor_position(spark, src, "mirror") == pos_before

    vt.commit_append(
        spark, src, spark.createDataFrame([(3, "c")], "k long, w string")
    )
    mirror_table_changes(spark, src, dst, keys=["k"], max_versions=None)
    assert _rows(vt.read_versioned(spark, dst)) == \
        _rows(vt.read_versioned(spark, src))
    # exactly one rename commit landed on the mirror
    hist = vt.table_history(spark, dst)
    assert sum(1 for e in hist if e["op"] == "rename_column") == 1
