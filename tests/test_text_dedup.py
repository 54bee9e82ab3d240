"""Text-analysis + dedup operator unit tests (§7.4 extensions)."""

import hashlib

from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, text


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "The  Cat  sat on the MAT"),  # same after normalization
        (3, "a completely different document entirely"),
        (4, "the cat sat on the mat today"),  # near-dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_normalizes_case_and_whitespace(spark):
    out = dedup.exact_dedup(_docs(spark))
    rows = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert rows[1] == 2  # docs 1+2 collapse; survivor = min id
    assert out.count() == 3


def test_ngram_jaccard_finds_neardups(spark):
    pairs = dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.5, n=3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 2) not in got  # case differs → different shingles
    assert (1, 4) in got  # 4/5 shared shingles
    assert abs(got[(1, 4)] - 4 / 5) < 1e-12


def test_minhash_signature_identical_for_identical_shingles(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, "p q r s")], ["doc_id", "text"]
    )
    sig = {r["doc_id"]: (r["mh0"], r["mh1"]) for r in dedup.minhash_signature(df, k=2).collect()}
    assert sig[1] == sig[2] != sig[3]


def test_minhash_lsh_pairs_catch_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "x y z w v"), (2, "x y z w v"), (3, "p q r s t")], ["doc_id", "text"]
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(df, k=4, bands=2).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_simhash_close_for_similar_docs(spark):
    out = _docs(spark).select("doc_id", dedup.simhash16("text").alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in out}
    assert all(0 <= v < 2**16 for v in h.values())
    ham_14 = bin(h[1] ^ h[4]).count("1")
    ham_13 = bin(h[1] ^ h[3]).count("1")
    assert ham_14 < ham_13  # near-dup closer than unrelated doc


def test_simhash_matches_python_reference(spark):
    # independent python implementation of the same spec
    def ref(textv):
        toks = [t for t in textv.split(" ") if t]
        sums = [0] * 16
        for t in toks:
            d = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
            for i in range(16):
                sums[i] += ((d >> i) & 1) * 2 - 1
        return sum(2**i for i in range(16) if sums[i] > 0)

    rows = _docs(spark).select("text", dedup.simhash16("text").alias("h")).collect()
    for r in rows:
        assert r["h"] == ref(r["text"])


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame([(1, "The cat  sat"), (2, "a b")], ["doc_id", "text"])
    q = text.quality_features(df).collect()
    m = {r["doc_id"]: r for r in q}
    assert m[1]["n_tokens"] == 3
    assert abs(m[1]["mean_token_len"] - (3 + 3 + 3) / 3) < 1e-12
    assert abs(m[1]["stopword_ratio"] - 1 / 3) < 1e-12  # 'The'
    assert m[2]["n_tokens"] == 2


def test_lang_id_marker_argmax(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of note"), (2, "el la los de nada"), (3, "xyz")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "es"
    assert out[3] == "en"  # all-zero tie → preference order


def test_doc_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a a"), (3, "a b d")], ["doc_id", "text"]
    )
    fp = {r["doc_id"]: r["f"] for r in
          df.select("doc_id", text.doc_fingerprint("text").alias("f")).collect()}
    assert fp[1] == fp[2] != fp[3]
