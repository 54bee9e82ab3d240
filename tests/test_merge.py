"""commit_merge (Delta-style MERGE INTO): clause semantics, file
granularity, schema invariance, contract guards, and a DuckDB
replay differential for an op-coded CDC batch.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from gedixr_spark.sinks import versioned as vt


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "merge_tab")
    vt.init_versioned(spark, path)
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, balance double",
    )
    vt.commit_append(spark, path, df, stats_cols=["id"])
    return path


def _rows(spark, path):
    return {
        r["id"]: (r["name"], r["balance"])
        for r in vt.read_versioned(spark, path).collect()
    }


def test_merge_update_delete_insert(spark, table):
    """One op-coded CDC batch drives all three clauses at once."""
    src = spark.createDataFrame(
        [
            (2, "b2", 5.0, "U"),   # matched -> update
            (3, "c", 0.0, "D"),    # matched -> delete
            (9, "z", 99.0, "I"),   # not matched -> insert
        ],
        "id long, name string, balance double, op string",
    )
    entry = vt.commit_merge(
        spark,
        table,
        src,
        keys=["id"],
        when_matched_update={"name": "s.name", "balance": "t.balance + s.balance"},
        update_condition="s.op = 'U'",
        when_matched_delete="s.op = 'D'",
        stats_cols=["id"],
    )
    assert entry["op"] == "merge"
    assert entry["meta"]["n_updated"] == 1
    assert entry["meta"]["n_deleted"] == 1
    assert entry["meta"]["n_inserted"] == 1
    got = _rows(spark, table)
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 25.0),  # t.balance + s.balance
        4: ("d", 40.0),
        9: ("z", 99.0),
    }
    # schema invariant: op column never lands in the table
    assert vt.read_versioned(spark, table).columns == ["id", "name", "balance"]


def test_merge_is_file_granular(spark, tmp_path):
    """Files without a source key are not rewritten (their names stay
    live across the merge commit)."""
    path = str(tmp_path / "fg_tab")
    vt.init_versioned(spark, path)
    lo = spark.createDataFrame(
        [(i, "x", 1.0) for i in range(10)], "id long, name string, balance double"
    )
    hi = spark.createDataFrame(
        [(i, "y", 2.0) for i in range(100, 110)],
        "id long, name string, balance double",
    )
    vt.commit_append(spark, path, lo.coalesce(1))
    vt.commit_append(spark, path, hi.coalesce(1))
    before = set(vt.live_files(spark, path))
    src = spark.createDataFrame(
        [(5, "upd", 9.0)], "id long, name string, balance double"
    )
    entry = vt.commit_merge(
        spark, path, src, keys=["id"], when_matched_update="all",
        when_not_matched_insert=False,
    )
    after = set(vt.live_files(spark, path))
    survivors = before & after
    assert entry["meta"]["n_files_rewritten"] == 1
    assert len(survivors) >= 1  # the hi-key file(s) stayed in place
    got = _rows(spark, path)
    assert got[5] == ("upd", 9.0) and got[105] == ("y", 2.0)


def test_merge_full_row_replace_all(spark, table):
    src = spark.createDataFrame(
        [(1, "A", 0.5)], "id long, name string, balance double"
    )
    vt.commit_merge(spark, table, src, keys=["id"], when_matched_update="all")
    assert _rows(spark, table)[1] == ("A", 0.5)


def test_merge_insert_only_and_noop(spark, table):
    src = spark.createDataFrame(
        [(7, "g", 70.0)], "id long, name string, balance double"
    )
    e1 = vt.commit_merge(spark, table, src, keys=["id"])
    assert e1["meta"]["n_inserted"] == 1 and e1["meta"]["n_files_rewritten"] == 0
    # merging the same row again with inserts off: provable no-op
    e2 = vt.commit_merge(
        spark,
        table,
        spark.createDataFrame(
            [(999, "q", 1.0)], "id long, name string, balance double"
        ),
        keys=["id"],
        when_not_matched_insert=False,
        when_matched_delete="true",
    )
    assert e2["op"] == "noop"
    assert vt.table_history(spark, table)[-1]["version"] == e1["version"]


def test_merge_time_travel_and_guards(spark, table):
    v_before = vt.table_history(spark, table)[-1]["version"]
    src = spark.createDataFrame(
        [(1, "gone", 0.0)], "id long, name string, balance double"
    )
    vt.commit_merge(
        spark, table, src, keys=["id"], when_matched_delete="true",
        when_not_matched_insert=False,
    )
    assert 1 not in _rows(spark, table)
    old = {
        r["id"] for r in vt.read_versioned(spark, table, v_before).collect()
    }
    assert 1 in old  # pre-merge snapshot intact
    with pytest.raises(ValueError, match="no-op"):
        vt.commit_merge(
            spark, table, src, keys=["id"], when_not_matched_insert=False
        )
    with pytest.raises(ValueError, match="key"):
        vt.commit_merge(spark, table, src, keys=[])
    with pytest.raises(ValueError, match="update key"):
        vt.commit_merge(
            spark, table, src, keys=["id"], when_matched_update={"id": "s.id + 1"}
        )
    dup = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "id long, name string, balance double"
    )
    with pytest.raises(ValueError, match="distinct"):
        vt.commit_merge(spark, table, dup, keys=["id"])
    with pytest.raises(ValueError, match="missing"):
        vt.commit_merge(
            spark,
            table,
            spark.createDataFrame([(55,)], "id long"),
            keys=["id"],
        )


def test_merge_runs_two_pre_write_actions(spark, table, monkeypatch):
    """The docstring's single-pass claim, pinned (r9 VERDICT #3): a
    merge evaluates the join via exactly TWO driver actions before the
    data-file write — file discovery and the one combined
    contract+accounting aggregate. Counted by instrumenting
    DataFrame.collect and marking the write, so the assertion is
    independent of how many Spark jobs AQE fans each action into. A
    third pre-write action (the r8 shape re-scanned the target for
    inserts) fails this test."""
    # patch the CONCRETE class: in pyspark>=4 pyspark.sql.DataFrame is
    # an abstract dispatcher and instances are classic.dataframe ones
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pyspark 3.x
        from pyspark.sql import DataFrame

    events: list[str] = []
    real_collect = DataFrame.collect
    real_write = vt._write_data_files

    def counting_collect(self):
        events.append("collect")
        return real_collect(self)

    def marking_write(*a, **kw):
        events.append("write")
        return real_write(*a, **kw)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(vt, "_write_data_files", marking_write)
    src = spark.createDataFrame(
        [(2, "B", 200.0), (9, "i", 90.0)], "id long, name string, balance double"
    )
    vt.commit_merge(
        spark, table, src, keys=["id"], when_matched_update="all"
    )
    assert "write" in events, "merge must have written data files"
    pre_write = events[: events.index("write")]
    assert pre_write.count("collect") == 2, events


def test_merge_matches_duckdb_cdc_replay(spark, tmp_path):
    """Differential: the merged table equals a DuckDB replay of the
    same CDC semantics (update/delete/insert by op code) over the same
    start state."""
    path = str(tmp_path / "duck_tab")
    vt.init_versioned(spark, path)
    base_rows = [(i, f"n{i}", float(i)) for i in range(20)]
    vt.commit_append(
        spark,
        path,
        spark.createDataFrame(base_rows, "id long, name string, balance double"),
    )
    cdc_rows = (
        [(i, f"u{i}", 100.0 + i, "U") for i in (0, 3, 8, 12, 18)]
        + [(i, "", 0.0, "D") for i in (1, 6, 11, 16)]
        + [(i, f"new{i}", -1.0, "I") for i in range(30, 35)]
    )
    src = spark.createDataFrame(
        cdc_rows, "id long, name string, balance double, op string"
    )
    vt.commit_merge(
        spark,
        path,
        src,
        keys=["id"],
        when_matched_update={"name": "s.name", "balance": "s.balance"},
        update_condition="s.op = 'U'",
        when_matched_delete="s.op = 'D'",
    )
    got = sorted(
        (r["id"], r["name"], r["balance"])
        for r in vt.read_versioned(spark, path).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(id BIGINT, name VARCHAR, balance DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?)", base_rows)
    con.execute("CREATE TABLE s(id BIGINT, name VARCHAR, balance DOUBLE, op VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", cdc_rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT COALESCE(s.id, t.id),
                   CASE WHEN s.op = 'U' THEN s.name ELSE t.name END,
                   CASE WHEN s.op = 'U' THEN s.balance ELSE t.balance END
            FROM t LEFT JOIN s USING (id)
            WHERE s.op IS NULL OR s.op <> 'D'
            UNION ALL
            SELECT s.id, s.name, s.balance
            FROM s ANTI JOIN t USING (id)
            """
        ).fetchall()
    )
    assert got == want


def test_update_delete_only_merge_uses_left_outer(spark, table):
    """r9 ADVICE: full_outer equi-joins can never broadcast-hash in
    Spark, so an update/delete-only merge (the common small-CDC-batch
    shape) must take the LEFT OUTER path — semantics identical
    (unmatched source rows are no-ops), join shape recorded in the
    commit meta. Unmatched source keys must NOT insert, and duplicate
    matched keys must still trip the one-row-per-key contract."""
    src = spark.createDataFrame(
        [(2, "B2", 0.0, "U"), (3, "", 0.0, "D"), (99, "ghost", 1.0, "U")],
        "id long, name string, balance double, op string",
    )
    res = vt.commit_merge(
        spark,
        table,
        src,
        keys=["id"],
        when_matched_update={"name": "s.name"},
        update_condition="s.op = 'U'",
        when_matched_delete="s.op = 'D'",
        when_not_matched_insert=False,
    )
    assert res["meta"]["merge_join"] == "left_outer"
    assert res["meta"]["n_inserted"] == 0
    got = _rows(spark, table)
    assert 99 not in got  # unmatched source row did not insert
    assert 3 not in got  # deleted
    assert got[2] == ("B2", 20.0)  # partial-column update
    assert got[1] == ("a", 10.0) and got[4] == ("d", 40.0)

    # insert-bearing merges still take the full-outer single-pass path
    src2 = spark.createDataFrame(
        [(50, "new", 5.0)], "id long, name string, balance double"
    )
    res2 = vt.commit_merge(spark, table, src2, keys=["id"])
    assert res2["meta"]["merge_join"] == "full_outer"
    assert res2["meta"]["n_inserted"] == 1

    # duplicate MATCHED source keys still trip the contract in
    # left-outer mode (they fan out over the target row)
    dup = spark.createDataFrame(
        [(1, "x", 0.0), (1, "y", 0.0)], "id long, name string, balance double"
    )
    with pytest.raises(ValueError, match="distinct"):
        vt.commit_merge(
            spark, table, dup, keys=["id"],
            when_matched_update={"name": "s.name"},
            when_not_matched_insert=False,
        )


def test_left_outer_merge_rejects_null_keys(spark, table):
    """ADVICE r10: in left-outer mode NULL-keyed source rows were
    silently dropped by the join (full_outer rejects them via the
    nk != n_src check) — the contract must be mode-independent. The
    in-plan guard rejects the batch and nothing commits."""
    src = spark.createDataFrame(
        [(2, "B2", 0.0), (None, "ghost", 1.0)],
        "id long, name string, balance double",
    )
    v_before = vt.table_history(spark, table)[-1]["version"]
    with pytest.raises(Exception, match="NULL-keyed"):
        vt.commit_merge(
            spark, table, src, keys=["id"],
            when_matched_update={"name": "s.name"},
            when_not_matched_insert=False,
        )
    assert vt.table_history(spark, table)[-1]["version"] == v_before
    assert _rows(spark, table)[2] == ("b", 20.0)  # untouched


@pytest.mark.parametrize("seed,insert_mode", [(11, True), (23, False), (47, True)])
def test_merge_randomized_duckdb_differential(spark, tmp_path, seed, insert_mode):
    """Randomized (seeded) CDC differential over both join modes: a
    random start state and a random op-coded batch — U/D on a random
    subset of present keys, I on random absent keys — must equal the
    DuckDB replay. Exercises key overlap patterns a hand-picked batch
    can't: updates of just-inserted-by-earlier-commit rows, empty
    clause groups, unmatched U/D rows in left-outer mode."""
    import numpy as np

    rng = np.random.default_rng(seed)
    path = str(tmp_path / f"rand_tab_{seed}")
    vt.init_versioned(spark, path)
    n = int(rng.integers(30, 80))
    base_rows = [
        (int(k), f"n{k}", float(rng.integers(0, 1000)))
        for k in rng.choice(500, size=n, replace=False)
    ]
    vt.commit_append(
        spark,
        path,
        spark.createDataFrame(base_rows, "id long, name string, balance double"),
    )
    present = [r[0] for r in base_rows]
    touched = rng.choice(present, size=min(20, len(present)), replace=False)
    ups = [int(k) for k in touched[:10]]
    dels = [int(k) for k in touched[10:]]
    absent = [int(k) for k in rng.choice(500, size=30, replace=False)
              if int(k) not in set(present)][:8]
    cdc_rows = (
        [(k, f"u{k}", float(rng.integers(0, 100)), "U") for k in ups]
        + [(k, "", 0.0, "D") for k in dels]
        + ([(k, f"i{k}", -1.0, "I") for k in absent] if insert_mode
           else [(k, f"g{k}", -1.0, "U") for k in absent])  # unmatched no-ops
    )
    src = spark.createDataFrame(
        cdc_rows, "id long, name string, balance double, op string"
    )
    res = vt.commit_merge(
        spark,
        path,
        src,
        keys=["id"],
        when_matched_update={"name": "s.name", "balance": "s.balance"},
        update_condition="s.op = 'U'",
        when_matched_delete="s.op = 'D'",
        when_not_matched_insert=insert_mode,
    )
    assert res["meta"]["merge_join"] == (
        "full_outer" if insert_mode else "left_outer"
    )
    got = sorted(
        (r["id"], r["name"], r["balance"])
        for r in vt.read_versioned(spark, path).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, name VARCHAR, balance DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", base_rows)
    con.execute(
        "CREATE TABLE s(id BIGINT, name VARCHAR, balance DOUBLE, op VARCHAR)"
    )
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", cdc_rows)
    sql = """
        SELECT COALESCE(s.id, t.id),
               CASE WHEN s.op = 'U' THEN s.name ELSE t.name END,
               CASE WHEN s.op = 'U' THEN s.balance ELSE t.balance END
        FROM t LEFT JOIN s USING (id)
        WHERE s.op IS NULL OR s.op <> 'D'
    """
    if insert_mode:
        sql += """
        UNION ALL
        SELECT s.id, s.name, s.balance FROM s ANTI JOIN t USING (id)
        """
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_merge_schema_evolution_basic(spark, table):
    """r10 VERDICT #6: merge_schema=True appends NEW source columns;
    untouched old files NULL-backfill on read; every older version
    still reads under its own schema; plain merges stay invariant."""
    src = spark.createDataFrame(
        [(1, "a1", 10.0, "gold"), (50, "new", 5.0, "silver")],
        "id long, name string, balance double, tier string",
    )
    # without merge_schema the extra column is ignored (invariant)
    vt.commit_merge(spark, table, src, keys=["id"], when_matched_update="all")
    assert "tier" not in vt.read_versioned(spark, table).columns
    # with merge_schema it lands
    src2 = spark.createDataFrame(
        [(2, "b2", 20.0, "bronze"), (60, "n60", 6.0, "gold")],
        "id long, name string, balance double, tier string",
    )
    res = vt.commit_merge(
        spark, table, src2, keys=["id"], when_matched_update="all",
        merge_schema=True,
    )
    cur = vt.read_versioned(spark, table)
    assert cur.columns == ["id", "name", "balance", "tier"]
    got = {r["id"]: r["tier"] for r in cur.collect()}
    assert got[2] == "bronze" and got[60] == "gold"
    # untouched rows (other files) NULL-backfill
    assert got[3] is None and got[4] is None
    # pre-evolution versions keep their own schema
    pre = vt.read_versioned(spark, table, version=res["version"] - 1)
    assert "tier" not in pre.columns
    # a later type flip on the new column still rejects
    bad = spark.createDataFrame(
        [(2, "x", 1.0, 7)], "id long, name string, balance double, tier long"
    )
    with pytest.raises(ValueError, match="tier"):
        vt.commit_merge(
            spark, table, bad, keys=["id"], when_matched_update="all",
            merge_schema=True,
        )


@pytest.mark.parametrize("seed", [5, 17])
def test_merge_schema_evolution_randomized_differential(spark, tmp_path, seed):
    """Randomized differential extended to schema evolution (r10
    VERDICT #6): an evolving merge (new column, update-all + insert)
    followed by an op-coded delete-only merge must equal the DuckDB
    replay of ALTER TABLE ADD COLUMN + the same logical operations,
    and the pre-evolution snapshot must still read under the old
    schema."""
    import numpy as np

    rng = np.random.default_rng(seed)
    path = str(tmp_path / f"evo_{seed}")
    vt.init_versioned(spark, path)
    n = int(rng.integers(20, 50))
    base_rows = [
        (int(k), f"n{k}", float(rng.integers(0, 1000)))
        for k in rng.choice(300, size=n, replace=False)
    ]
    vt.commit_append(
        spark, path,
        spark.createDataFrame(
            base_rows, "id long, name string, balance double"
        ).repartition(3),
    )
    present = [r[0] for r in base_rows]
    ups = [int(k) for k in rng.choice(present, size=8, replace=False)]
    rest = [p for p in present if p not in set(ups)]
    dels = [int(k) for k in rng.choice(rest, size=4, replace=False)]
    absent = [
        int(k) for k in rng.choice(300, size=30, replace=False)
        if int(k) not in set(present)
    ][:5]
    evo_rows = (
        [(k, f"u{k}", float(rng.integers(0, 100)), f"t{k % 3}") for k in ups]
        + [(k, f"i{k}", -1.0, f"t{k % 3}") for k in absent]
    )
    vt.commit_merge(
        spark, path,
        spark.createDataFrame(
            evo_rows, "id long, name string, balance double, tier string"
        ),
        keys=["id"], when_matched_update="all", merge_schema=True,
    )
    vt.commit_merge(
        spark, path,
        spark.createDataFrame([(k, "D") for k in dels], "id long, op string"),
        keys=["id"],
        when_matched_delete="s.op = 'D'",
        when_not_matched_insert=False,
    )
    got = sorted(
        (r["id"], r["name"], r["balance"], r["tier"])
        for r in vt.read_versioned(spark, path).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, name VARCHAR, balance DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", base_rows)
    con.execute("ALTER TABLE t ADD COLUMN tier VARCHAR")
    con.execute("CREATE TABLE s(id BIGINT, name VARCHAR, balance DOUBLE, tier VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", evo_rows)
    con.execute(
        "UPDATE t SET name=s.name, balance=s.balance, tier=s.tier "
        "FROM s WHERE t.id = s.id"
    )
    con.execute(
        "INSERT INTO t SELECT s.* FROM s ANTI JOIN t USING (id)"
    )
    con.execute(
        f"DELETE FROM t WHERE id IN ({','.join(str(k) for k in dels)})"
    )
    want = sorted(tuple(r) for r in con.execute(
        "SELECT id, name, balance, tier FROM t"
    ).fetchall())
    assert got == want
    # pre-evolution snapshot reads under the OLD schema
    assert vt.read_versioned(spark, path, version=1).columns == [
        "id", "name", "balance",
    ]
