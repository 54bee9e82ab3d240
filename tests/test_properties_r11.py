"""Round-11 model-based property: the versioned table still equals the
dict model under the FULL op surface — upserts, both delete modes
(copy-on-write and deletion-vector), op-coded merges, compaction
(purging DVs), and rollback — at the latest version AND at every
historical snapshot. This is the generalization of
test_properties.py::test_versioned_table_matches_dict_model to the
merge-on-read + rollback machinery, where replay bugs would hide
(DV target pruning, restore_dv, purge bookkeeping).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.dictionaries(
            st.integers(0, 7), st.text("abc", min_size=1, max_size=2),
            min_size=1, max_size=3,
        ),
    ),
    st.tuples(st.just("delete_cow"), st.integers(0, 7)),
    st.tuples(st.just("delete_dv"), st.integers(0, 7)),
    st.tuples(
        st.just("merge"),
        st.dictionaries(
            st.integers(0, 7), st.text("mn", min_size=1, max_size=2),
            min_size=1, max_size=3,
        ),
    ),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("rollback"), st.integers(0, 9)),
)


# r13 VERDICT #2: raised from 4 unseeded examples (too thin to mean
# anything twice) to 25 derandomized — every run explores the same
# sampled space, so a green artifact is reproducible.
@given(ops=st.lists(_op, min_size=2, max_size=5))
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_full_op_surface_matches_dict_model(spark, tmp_path_factory, ops):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from gedixr_spark.sinks.versioned import (
        commit_compact,
        commit_delete,
        commit_merge,
        commit_upsert,
        init_versioned,
        read_versioned,
        rollback,
        snapshot_row_count,
        table_history,
    )

    path = str(tmp_path_factory.mktemp("vtprop11") / "t")
    init_versioned(spark, path)
    model: dict[int, str] = {}
    # every (version, model-state) pair ever observed — time travel
    # must reproduce ALL of them at the end, including states that a
    # later rollback "un-did"
    checkpoints: list[tuple[int, dict[int, str]]] = []

    def mk(batch):
        return spark.createDataFrame([Row(k=k, v=v) for k, v in batch.items()])

    for op, arg in ops:
        if op == "upsert":
            entry = commit_upsert(spark, path, mk(arg), keys=["k"])
            model.update(arg)
        elif op in ("delete_cow", "delete_dv"):
            entry = commit_delete(
                spark, path, F.col("k") == arg,
                mode="dv" if op == "delete_dv" else "cow",
            )
            if entry.get("op") == "noop":
                continue
            model.pop(arg, None)
        elif op == "merge":
            if not checkpoints:
                # merge into a table with no recorded schema raises by
                # contract — not a model transition
                continue
            entry = commit_merge(
                spark, path, mk(arg), keys=["k"], when_matched_update="all"
            )
            if entry.get("op") == "noop":
                continue
            model.update(arg)
        elif op == "compact":
            entry = commit_compact(spark, path, purge_dvs=True, n_files=1)
            if entry.get("op") == "noop":
                continue
        else:  # rollback to a random earlier checkpoint
            if not checkpoints:
                continue
            tv, snap = checkpoints[arg % len(checkpoints)]
            cur = table_history(spark, path)[-1]["version"]
            if tv == cur:
                continue
            entry = rollback(spark, path, tv)
            model = dict(snap)
        checkpoints.append((entry["version"], dict(model)))

    for version, snap in checkpoints:
        got = {
            r["k"]: r["v"]
            for r in read_versioned(spark, path, version=version).collect()
        }
        assert got == snap, (version, got, snap)
        # the metadata row count (when defined) must agree with the
        # model too — DV subtraction and restore_dv are where a
        # bookkeeping bug would show up first
        n = snapshot_row_count(spark, path, version=version)
        assert n is None or n == len(snap), (version, n, len(snap))
