"""Round-15 model-based property (r14 VERDICT #7): the CDC MIRROR
against a source-op alphabet (append / upsert / delete-cow /
delete-dv / addcol / RENAME / DROP — the last two exercising r15's
schema-op forwarding) with CRASHES injected at every interesting
point of the apply (before the upsert leg, between the sub-commits,
after the apply but before the cursor CAS). Invariants after a final
clean drain:

1. the mirror's latest row-set ≡ the source's (incl. forwarded
   additive evolution);
2. the mirror's upsert ledger ranges PARTITION the consumed span —
   non-overlapping, strictly increasing (the crashed-range recovery
   keeps replays exact even when the source advanced after a crash);
3. an idle re-run consumes nothing and changes nothing.

The schema-ops model found the r13 upsert crash; this is the same
investment for the streaming layer. 25 derandomized examples + a
deterministic crash-mode sweep.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


class Crash(RuntimeError):
    pass


_rows = st.dictionaries(
    st.integers(0, 9), st.text("abc", min_size=1, max_size=2),
    min_size=1, max_size=3,
)
_src_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("upsert"), _rows),
    st.tuples(st.just("delete_cow"), st.integers(0, 9)),
    st.tuples(st.just("delete_dv"), st.integers(0, 9)),
    st.tuples(st.just("addcol"), st.integers(0, 2)),
    st.tuples(st.just("rename"), st.integers(0, 9)),
    st.tuples(st.just("dropcol"), st.integers(0, 9)),
)
# per step: a source op, then optionally a drain attempt whose apply
# crashes at one of the three spots (None = clean drain, "skip" = no
# drain this step — the next drain sees a multi-commit backlog)
_crash = st.sampled_from([None, "skip", "before", "mid", "after"])
_step = st.tuples(_src_op, _crash)


def _rowset(df):
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)) for r in df.collect()),
        key=repr,
    )


def run_mirror_model(spark, tmp_path_factory, steps, monkeypatch_ctx=None):
    import gedixr_spark.sinks.cursor as cur
    import gedixr_spark.streaming.bronze as br
    from gedixr_spark.sinks import versioned as vt
    from gedixr_spark.streaming.cdc import mirror_table_changes

    base = tmp_path_factory.mktemp("mirror_model")
    src, dst = str(base / "src"), str(base / "dst")
    vt.init_versioned(spark, src)
    vt.commit_append(
        spark, src, spark.createDataFrame([(0, "z")], "k long, v string")
    )
    next_col = [0]
    next_key = [100]
    cols = ["k", "v"]

    def apply_src(op, arg):
        if op == "append":
            # GLOBALLY fresh keys: a keyed mirror assumes the source
            # upholds key uniqueness — duplicate appended keys would
            # legitimately collapse on upsert
            rows = []
            for _k, v in arg.items():
                rows.append(
                    tuple([next_key[0]] + [f"{v}{c}" for c in cols[1:]])
                )
                next_key[0] += 1
            vt.commit_append(
                spark, src,
                spark.createDataFrame(
                    rows, ", ".join(f"{c} {'long' if c == 'k' else 'string'}"
                                    for c in cols)
                ),
            )
        elif op == "upsert":
            rows = [
                tuple([k] + [f"{v}{c}" for c in cols[1:]])
                for k, v in arg.items()
            ]
            vt.commit_upsert(
                spark, src,
                spark.createDataFrame(
                    rows, ", ".join(f"{c} {'long' if c == 'k' else 'string'}"
                                    for c in cols)
                ),
                keys=["k"],
            )
        elif op in ("delete_cow", "delete_dv"):
            vt.commit_delete(
                spark, src, F.col("k") == arg,
                mode="cow" if op == "delete_cow" else "dv",
            )
        elif op == "addcol":
            name = f"c{next_col[0]}"
            next_col[0] += 1
            vt.add_column(spark, src, name, "string")
            cols.append(name)
        elif op == "rename":
            cands = cols[1:]
            if not cands:
                return  # nothing non-key to rename — no-op step
            old = cands[arg % len(cands)]
            new = f"r{next_col[0]}"
            next_col[0] += 1
            vt.rename_column(spark, src, old, new)
            cols[cols.index(old)] = new
        elif op == "dropcol":
            cands = cols[1:]
            if not cands:
                return  # nothing non-key to drop — no-op step
            name = cands[arg % len(cands)]
            vt.drop_column(spark, src, name)
            cols.remove(name)

    def drain(crash_mode):
        """One mirror drain; crash_mode injects a failure inside the
        apply machinery. Exceptions are swallowed like a crashed
        worker's would be."""
        saved = []

        def patch(mod, name):
            orig = getattr(mod, name)
            saved.append((mod, name, orig))

            def boom(*a, **k):
                raise Crash(f"{name} crashed")
            setattr(mod, name, boom)

        try:
            if crash_mode == "before":
                patch(br, "upsert_stream_batch")
            elif crash_mode == "mid":
                patch(br, "delete_stream_batch")
            elif crash_mode == "after":
                patch(cur, "commit_cursor")
            try:
                mirror_table_changes(
                    spark, src, dst, keys=["k"], max_versions=2
                )
            except Crash:
                pass
        finally:
            for mod, name, orig in saved:
                setattr(mod, name, orig)

    for (op, arg), crash_mode in steps:
        apply_src(op, arg)
        if crash_mode != "skip":
            drain(crash_mode)

    # final CLEAN drain, then the three invariants
    mirror_table_changes(spark, src, dst, keys=["k"], max_versions=2)
    assert _rowset(vt.read_versioned(spark, dst)) == \
        _rowset(vt.read_versioned(spark, src))

    spans = sorted(
        tuple(map(int, m.groups()))
        for bid in vt.seen_stream_batch_ids(spark, dst)
        if (m := re.match(r"^mirror:(\d+)-(\d+):u$", str(bid)))
    )
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 <= a2, f"overlapping upsert ranges: {spans}"
        assert a1 < b1 and a2 < b2, spans

    out = mirror_table_changes(spark, src, dst, keys=["k"])
    assert out["batches"] == 0
    assert _rowset(vt.read_versioned(spark, dst)) == \
        _rowset(vt.read_versioned(spark, src))


@given(steps=st.lists(_step, min_size=2, max_size=4))
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mirror_crash_model(spark, tmp_path_factory, steps):
    run_mirror_model(spark, tmp_path_factory, steps)


def test_mirror_crash_mode_sweep(spark, tmp_path_factory):
    """Deterministic sweep: every crash mode, each followed by source
    advance before the next drain — the exact shapes the property
    samples, pinned independent of sampling."""
    run_mirror_model(
        spark, tmp_path_factory,
        [
            (("append", {1: "a", 2: "b"}), "before"),
            (("upsert", {1: "x"}), "mid"),
            (("delete_dv", 2), "after"),
            (("addcol", 0), "skip"),
            (("rename", 0), "after"),
            (("upsert", {3: "c"}), "mid"),
            (("dropcol", 1), "before"),
            (("delete_cow", 1), None),
        ],
    )
