"""Round-12 model-based property: the versioned table equals the dict
model when SCHEMA OPS interleave the data ops — renames and drops
(column mapping) mixed with upserts, both delete modes, compaction,
additive column adds, and rollback, checked at the latest version AND
at every historical snapshot WITH each snapshot's own column names.
This is where mapping-replay bugs would hide: a stale rename map on a
time-travel read, an id reused after a drop, a rollback that restores
files but not names.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.dictionaries(
            st.integers(0, 7), st.text("ab", min_size=1, max_size=2),
            min_size=1, max_size=3,
        ),
    ),
    st.tuples(st.just("rename"), st.integers(0, 99)),
    st.tuples(st.just("addcol"), st.integers(0, 7)),
    st.tuples(st.just("adddef"), st.integers(0, 7)),
    st.tuples(st.just("dropcol"), st.integers(0, 99)),
    st.tuples(st.just("delete_cow"), st.integers(0, 7)),
    st.tuples(st.just("delete_dv"), st.integers(0, 7)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("rollback"), st.integers(0, 9)),
    # r14: checkpoint (derived data, no model effect) in BOTH shapes —
    # random interleavings with renames/drops/widens/rollbacks are
    # where a manifest field that forgot colmap state would surface
    st.tuples(st.just("checkpoint"), st.integers(0, 1)),
)


# r13 VERDICT #2: max_examples=4 unseeded let a 3-op falsifying
# example (addcol → upsert-into-the-old-file → rename) survive two
# green rounds. derandomize=True makes every run explore the SAME
# sampled space, so a committed green artifact means the same thing
# on re-run; the found example itself is pinned deterministically
# below (test_pinned_addcol_upsert_rename).
@given(ops=st.lists(_op, min_size=3, max_size=6))
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_schema_ops_interleaved_match_dict_model(
    spark, tmp_path_factory, ops
):
    run_schema_ops_model(spark, tmp_path_factory, ops)


def test_pinned_addcol_upsert_rename(spark, tmp_path_factory):
    """The exact falsifying example hypothesis drew for the r13 judge:
    an append-evolved (never-mapped) table whose upsert touches a file
    predating the evolution — the kept-side mergeSchema rewrite came
    back narrow and unionByName threw NUM_COLUMNS_MISMATCH
    (versioned.py commit_upsert, fixed r14). Pinned so the regression
    never depends on sampling luck again."""
    run_schema_ops_model(
        spark, tmp_path_factory,
        [("addcol", 0), ("upsert", {0: "a"}), ("rename", 0)],
    )


def run_schema_ops_model(spark, tmp_path_factory, ops):
    from pyspark.sql import functions as F

    from gedixr_spark.sinks.versioned import (
        add_column,
        commit_append,
        commit_compact,
        commit_delete,
        commit_upsert,
        drop_column,
        init_versioned,
        read_versioned,
        rename_column,
        rollback,
    )

    path = str(tmp_path_factory.mktemp("vtprop12") / "t")
    init_versioned(spark, path)
    # model: ordered schema (k first) + rows {k: {col: val}}
    schema: list[str] = ["k", "v0"]
    rows: dict[int, dict] = {}
    step_id = 0
    checkpoints: list[tuple[int, list[str], dict]] = []

    def mk(batch: dict):
        # full-row frames under the CURRENT schema (string value cols)
        data = [
            tuple(
                k if c == "k" else d.get(c)
                for c in schema
            )
            for k, d in batch.items()
        ]
        sch = ", ".join(
            f"{c} long" if c == "k" else f"{c} string" for c in schema
        )
        return spark.createDataFrame(data, schema=sch)

    # seed so every op has something to chew on
    seed = {k: {"v0": f"s{k}"} for k in range(3)}
    entry = commit_append(spark, path, mk(seed))
    rows.update(seed)
    checkpoints.append((entry["version"], list(schema), {
        k: dict(d) for k, d in rows.items()
    }))

    for op, arg in ops:
        step_id += 1
        if op == "upsert":
            batch = {k: {c: f"{v}{k}" for c in schema if c != "k"}
                     for k, v in arg.items()}
            entry = commit_upsert(spark, path, mk(batch), keys=["k"])
            rows.update(batch)
        elif op == "rename":
            candidates = [c for c in schema if c != "k"]
            if not candidates:
                continue
            old = candidates[arg % len(candidates)]
            new = f"{old}_r{step_id}"
            entry = rename_column(spark, path, old, new)
            schema = [new if c == old else c for c in schema]
            for d in rows.values():
                if old in d:
                    d[new] = d.pop(old)
        elif op == "addcol":
            new = f"c{step_id}"
            schema2 = schema + [new]
            batch = {
                100 + step_id * 10 + j: {
                    **{c: None for c in schema2 if c != "k"},
                    new: f"n{j}",
                }
                for j in range(2)
            }
            schema = schema2
            entry = commit_append(spark, path, mk(batch))
            # existing rows NULL-backfill the new column
            for d in rows.values():
                d.setdefault(new, None)
            rows.update(batch)
        elif op == "adddef":
            new = f"d{step_id}"
            dval = f"def{arg}"
            entry = add_column(spark, path, new, "string", default=dval)
            schema = schema + [new]
            # every existing row surfaces the default; rows written
            # later carry whatever their batch says
            for d in rows.values():
                d[new] = dval
        elif op == "dropcol":
            candidates = [c for c in schema if c != "k"]
            if len(candidates) < 2:
                continue  # keep at least one value column
            victim = candidates[arg % len(candidates)]
            entry = drop_column(spark, path, victim)
            schema = [c for c in schema if c != victim]
            for d in rows.values():
                d.pop(victim, None)
        elif op in ("delete_cow", "delete_dv"):
            entry = commit_delete(
                spark, path, F.col("k") == arg,
                mode="dv" if op == "delete_dv" else "cow",
            )
            if entry.get("op") == "noop":
                continue
            rows.pop(arg, None)
        elif op == "compact":
            entry = commit_compact(spark, path, purge_dvs=True, n_files=1)
            if entry.get("op") == "noop":
                continue
        elif op == "checkpoint":
            from gedixr_spark.sinks.versioned import checkpoint_log

            checkpoint_log(
                spark, path, format="parquet" if arg else "json"
            )
            continue  # derived data: no version, no model change
        else:  # rollback
            if not checkpoints:
                continue
            tv, snap_schema, snap_rows = checkpoints[arg % len(checkpoints)]
            from gedixr_spark.sinks.versioned import table_history

            cur = table_history(spark, path)[-1]["version"]
            if tv == cur:
                continue
            entry = rollback(spark, path, tv)
            schema = list(snap_schema)
            rows = {k: dict(d) for k, d in snap_rows.items()}
        checkpoints.append(
            (entry["version"], list(schema), {
                k: dict(d) for k, d in rows.items()
            })
        )

    for version, snap_schema, snap_rows in checkpoints:
        df = read_versioned(spark, path, version=version)
        assert sorted(df.columns) == sorted(snap_schema), (
            version, df.columns, snap_schema,
        )
        got = {
            r["k"]: {c: r[c] for c in snap_schema if c != "k"}
            for r in df.collect()
        }
        assert got == snap_rows, (version, got, snap_rows)
