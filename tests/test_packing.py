"""Sequence packing (operators/packing.py): determinism, budget
respect, oversize handling, fill accounting."""

import pytest

from gedixr_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, toks):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], ["doc_id", "n_tokens"]
    )


def test_next_fit_decreasing_semantics(spark):
    # one group so the sequential pass is fully predictable; sorted
    # desc = 9,7,4,3,1 at budget 10: 9 (fill 9) | 7 (9+7>10, new, fill
    # 7) | 4 (7+4>10, new, fill 4) + 3 (fill 7) + 1 (fill 8).
    # Next-fit never looks back — 1 does NOT backfill seq 0.
    df = _docs(spark, [9, 7, 4, 3, 1])
    out = pack_sequences(df, budget=10, n_groups=1)
    got = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 2}


def test_budget_respected_except_oversize(spark):
    import random

    rng = random.Random(11)
    df = _docs(spark, [rng.randint(1, 120) for _ in range(300)])
    out = pack_sequences(df, budget=256, n_groups=4)
    fills = (
        out.groupBy("pack_group", "seq_id").sum("n_tokens").collect()
    )
    assert all(r["sum(n_tokens)"] <= 256 for r in fills)
    # every doc packed exactly once
    assert out.count() == 300 and out.select("doc_id").distinct().count() == 300


def test_oversize_doc_gets_own_sequence(spark):
    df = _docs(spark, [500, 10, 10])
    out = pack_sequences(df, budget=100, n_groups=1)
    rows = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    # 500 packs alone (seq 0, sorted first); the two 10s share seq 1
    assert rows[0] == 0 and rows[1] == rows[2] == 1


def test_packing_deterministic_under_repartition(spark):
    df = _docs(spark, list(range(1, 60)))
    a = sorted(map(tuple, pack_sequences(df, 64, 4).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(7), 64, 4).collect()))
    assert a == b


def test_packing_stats_fill_ratio(spark):
    df = _docs(spark, [6, 4, 5, 5])
    out = pack_sequences(df, budget=10, n_groups=1)
    stats = packing_stats(out, budget=10).collect()[0]
    # sorted desc 6,5,5,4 at budget 10: [6] | [5,5] | [4] → 3 seqs,
    # 20 packed tokens over 3×10 capacity
    assert stats["n_seqs"] == 3 and stats["total_tokens"] == 20
    assert stats["fill_ratio"] == pytest.approx(20 / 30)


def test_invalid_args_raise(spark):
    df = _docs(spark, [1])
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, n_groups=0)


def test_packing_properties_hypothesis(spark):
    """Property sweep without per-example Spark jobs (one job per
    list): every doc packed exactly once; every sequence fill ≤ budget
    unless it is a single oversize doc; NFD order within groups."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=80),
        budget=st.integers(min_value=16, max_value=128),
    )
    def check(toks, budget):
        df = _docs(spark, toks)
        out = pack_sequences(df, budget=budget, n_groups=3).collect()
        assert sorted(r["doc_id"] for r in out) == list(range(len(toks)))
        fills = {}
        for r in out:
            key = (r["pack_group"], r["seq_id"])
            fills.setdefault(key, []).append(r["n_tokens"])
        for members in fills.values():
            assert sum(members) <= budget or len(members) == 1

    check()


def test_packing_differential_vs_python_reference(spark):
    """Exact equality with an independent pure-Python NFD pass (not
    just invariant checks): same grouping, same order, same seq ids."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def reference_nfd(toks_by_id, budget, n_groups):
        out = {}
        for g in range(n_groups):
            members = sorted(
                ((i, t) for i, t in toks_by_id.items() if i % n_groups == g),
                key=lambda it: (-it[1], it[0]),
            )
            fill, seq = 0, 0
            for pos, (i, t) in enumerate(members):
                if pos == 0:
                    fill = t
                elif fill + t > budget:
                    seq += 1
                    fill = t
                else:
                    fill += t
                out[i] = (g, seq)
        return out

    @settings(max_examples=8, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=60),
        budget=st.integers(min_value=8, max_value=96),
    )
    def check(toks, budget):
        by_id = dict(enumerate(toks))
        got = {
            r["doc_id"]: (r["pack_group"], r["seq_id"])
            for r in pack_sequences(_docs(spark, toks), budget=budget, n_groups=2).collect()
        }
        assert got == reference_nfd(by_id, budget, 2)

    check()


def test_negative_doc_ids_group_like_oracle_arithmetic(spark):
    """pmod(pack_group) parity with the oracle's ((d % n) + n) % n for
    negative ids (ADVICE r4: DuckDB's plain % follows the dividend
    sign, so the oracle uses the pmod-equivalent form)."""
    import duckdb

    ids = [-17, -8, -1, 0, 1, 7, 8, 23]
    df = spark.createDataFrame([(i, 5) for i in ids], ["doc_id", "n_tokens"])
    got = {
        r["doc_id"]: r["pack_group"]
        for r in pack_sequences(df, budget=100, n_groups=8).collect()
    }
    oracle = dict(
        duckdb.sql(
            "SELECT d, ((d % 8) + 8) % 8 FROM (VALUES "
            + ",".join(f"({i})" for i in ids)
            + ") t(d)"
        ).fetchall()
    )
    assert got == oracle
    assert all(0 <= g < 8 for g in got.values())
