"""Property-based laws for the round-7 operators: chunker coverage /
reconstruction, SQ8 reconstruction bound under arbitrary value ranges
(including constant dimensions), leakage-audit pair conservation."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    n_tokens=st.integers(min_value=0, max_value=40),
    chunk=st.integers(min_value=2, max_value=10),
    overlap=st.integers(min_value=0, max_value=9),
)
@settings(**SETTINGS)
def test_chunker_covers_every_token_and_reconstructs(
    spark, n_tokens, chunk, overlap
):
    from gedixr_spark.operators.text import chunk_documents

    overlap = min(overlap, chunk - 1)
    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(
            df, chunk_tokens=chunk, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    if n_tokens == 0:
        assert rows == []
        return
    stride = chunk - overlap
    # coverage: every token index appears in at least one window
    covered = set()
    for r in rows:
        piece = r["chunk_text"].split() if r["chunk_text"] else []
        assert piece == toks[r["chunk_start"]: r["chunk_start"] + chunk]
        assert r["n_tokens"] == len(piece)
        covered.update(range(r["chunk_start"], r["chunk_start"] + len(piece)))
    assert covered == set(range(n_tokens))
    # chunk ids are dense from 0 and starts follow the stride grid
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    assert all(r["chunk_start"] == i * stride for i, r in enumerate(rows))
    # reconstruction: stride-prefix concatenation rebuilds the doc
    rebuilt = []
    for r in rows[:-1]:
        rebuilt.extend(r["chunk_text"].split()[:stride])
    rebuilt.extend(rows[-1]["chunk_text"].split())
    assert rebuilt == toks


@given(
    data=st.lists(
        st.lists(
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=8,
    ),
    const=st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
)
@settings(**SETTINGS)
def test_sq8_reconstruction_bound_any_ranges(spark, data, const):
    """|x - decode(encode(x))| <= step/2 per dimension for arbitrary
    value ranges, including a CONSTANT dimension (max == min — the
    step=1.0 degenerate path must still round-trip exactly)."""
    from pyspark.sql import functions as F

    from gedixr_spark.operators import similarity as sim

    rows = [
        (i, [float(v[0]), float(v[1]), float(v[2]), float(const)])
        for i, v in enumerate(data)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = sim.sq8_train(df)
    dec = sim.sq8_encode(df, params).select(
        "vec_id", sim.sq8_decode(F.col("sq8"), params).alias("xhat")
    )
    got = {r["vec_id"]: r["xhat"] for r in dec.collect()}
    steps = params["steps"]
    for i, vec in rows:
        for d in range(4):
            assert abs(vec[d] - got[i][d]) <= steps[d] / 2 + 1e-9, (i, d)
    # constant dimension reconstructs exactly (code 0, min = value)
    for i, _ in rows:
        assert got[i][3] == params["mins"][3]


@given(
    n_pairs=st.integers(min_value=0, max_value=25),
    seed=st.integers(min_value=0, max_value=3),
)
@settings(**SETTINGS)
def test_leakage_audit_conserves_pairs(spark, n_pairs, seed):
    """Σ n_pairs over the audit == |pair table| whenever both endpoints
    have a split (no pair silently dropped or double-counted)."""
    from gedixr_spark.operators.sampling import hash_split, leakage_audit

    rng = np.random.default_rng(seed)
    ids = list(range(60))
    pairs = []
    seen = set()
    while len(pairs) < n_pairs:
        a, b = (int(x) for x in rng.choice(ids, 2, replace=False))
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        pairs.append(key)
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    splits = hash_split(docs, seed=f"s{seed}")
    if not pairs:
        pdf = spark.createDataFrame([], "id_a long, id_b long")
    else:
        pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    total = sum(
        r["n_pairs"] for r in leakage_audit(splits, pdf).collect()
    )
    assert total == len(pairs)
