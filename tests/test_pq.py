"""Product quantization (similarity.py PQ family): encode determinism,
exact ADC distances, packed-code range, and ADC-vs-reference parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import similarity as sim


def _emb_df(spark, n=40, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(v) for v in rng.standard_normal(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _reference_codes_and_dist(vecs, qv, codebooks):
    """Plain-numpy PQ encode + ADC — the semantics the Spark kernels
    must reproduce exactly (all int64)."""
    cbs = [np.asarray(cb, dtype=np.int64) for cb in codebooks]
    q10 = np.round(np.asarray(qv) * 1000).astype(np.int64) * 10
    dists = {}
    for vid, v in vecs:
        v10 = np.round(np.asarray(v) * 1000).astype(np.int64) * 10
        total, ofs = 0, 0
        for cb in cbs:
            dsub = cb.shape[1]
            sub = v10[ofs : ofs + dsub]
            code = int(np.argmin(((cb - sub) ** 2).sum(axis=1)))
            total += int(((q10[ofs : ofs + dsub] - cb[code]) ** 2).sum())
            ofs += dsub
        dists[vid] = total
    return dists


def test_pq_codebooks_shape_and_determinism():
    a = sim.pq_codebooks(64, 2, 16, 13)
    b = sim.pq_codebooks(64, 2, 16, 13)
    assert a == b
    assert len(a) == 2 and len(a[0]) == 16 and len(a[0][0]) == 32
    with pytest.raises(ValueError):
        sim.pq_codebooks(dim=10, m=3)


def test_pq_codes_match_reference(spark):
    cbs = sim.pq_codebooks(8, 2, 4, 5)
    df = _emb_df(spark, n=30, dim=8)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in df.select(
            "vec_id", sim.pq_codes("embedding", cbs).alias("codes")
        ).collect()
    }
    cbs_np = [np.asarray(cb, dtype=np.int64) for cb in cbs]
    for r in df.collect():
        v10 = np.round(np.asarray(r["embedding"]) * 1000).astype(np.int64) * 10
        want, ofs = [], 0
        for cb in cbs_np:
            dsub = cb.shape[1]
            want.append(int(np.argmin(((cb - v10[ofs : ofs + dsub]) ** 2).sum(axis=1))))
            ofs += dsub
        assert got[r["vec_id"]] == want


def test_pq_code_packed_range(spark):
    cbs = sim.pq_codebooks(8, 2, 4, 5)
    df = _emb_df(spark, n=30, dim=8)
    vals = [
        r[0]
        for r in df.select(sim.pq_code_packed("embedding", cbs)).collect()
    ]
    assert all(0 <= v < 16 for v in vals)  # 2 subspaces × 4 codes → 0..15


def test_pq_ann_topk_exact_adc(spark):
    cbs = sim.pq_codebooks(8, 2, 4, 5)
    df = _emb_df(spark, n=25, dim=8)
    out = sim.pq_ann_topk(df.filter(F.col("vec_id") == 0), df, k=5, codebooks=cbs)
    rows = {r["cand_id"]: (r["approx_dist"], r["rank"]) for r in out.collect()}

    data = [(r["vec_id"], r["embedding"]) for r in df.collect()]
    qv = dict(data)[0]
    ref = _reference_codes_and_dist([d for d in data if d[0] != 0], qv, cbs)
    want_top = sorted(ref.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    assert [(cid, d) for cid, (d, _) in sorted(rows.items(), key=lambda kv: kv[1][1])] == want_top
