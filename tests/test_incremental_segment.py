"""Unit tests for incremental_dedup (history signature store) and
segment_dedup (CCNet-style boilerplate removal)."""

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def inc_data(spark):
    hist = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different historical content about spark engines"),
            (3, "short"),
        ],
    )
    new = _docs(
        spark,
        [
            # exact copy of hist 1 (modulo case/whitespace → same exact_key)
            (10, "The quick  brown fox jumps over the lazy dog today"),
            # near-dup of hist 2 (one token changed)
            (11, "completely different historical content about flink engines"),
            # genuinely new
            (12, "a brand new document sharing nothing with history at all"),
            # shingle-less doc, no exact match → keep
            (13, "tiny doc"),
        ],
    )
    return hist, new


def _decisions(hist, new, **kw):
    out = dedup.incremental_dedup(new, hist, threshold=0.3, k=8, bands=4, **kw)
    return {r["doc_id"]: (r["action"], r["match_id"]) for r in out.collect()}


def test_incremental_dedup_actions(inc_data):
    hist, new = inc_data
    d = _decisions(hist, new)
    assert d[10] == ("drop_exact", 1)
    assert d[11] == ("drop_near", 2)
    assert d[12] == ("keep", None)
    assert d[13] == ("keep", None)
    assert len(d) == 4  # every new doc gets exactly one decision


def test_incremental_dedup_store_path_equivalent(inc_data, spark):
    """Passing a persisted signature_store gives identical decisions to
    passing raw history text (the store is lossless for dedup)."""
    hist, new = inc_data
    store = dedup.signature_store(hist, k=8)
    d_raw = _decisions(hist, new)
    d_store = _decisions(store, new, history_is_store=True)
    assert d_raw == d_store


def test_signature_store_keeps_shingleless_docs(inc_data):
    hist, _ = inc_data
    store = dedup.signature_store(hist, k=4).collect()
    rows = {r["doc_id"]: r for r in store}
    assert set(rows) == {1, 2, 3}  # doc 3 (<3 tokens) still present
    assert rows[3]["mh0"] is None and rows[3]["shs"] == []
    assert rows[1]["mh0"] is not None


def test_incremental_exact_precedence_over_near(spark):
    """A doc that matches history both exactly and nearly is dropped as
    exact (with the min exact match id), not double-counted."""
    hist = _docs(spark, [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")])
    new = _docs(spark, [(20, "alpha beta gamma delta epsilon")])
    d = _decisions(hist, new)
    assert d[20] == ("drop_exact", 1)


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------


def test_segment_dedup_removes_shared_chunks(spark):
    boiler = "one two three four five six seven eight nine ten"
    df = _docs(
        spark,
        [
            (1, boiler + " unique tail of document one here now ok yes"),
            (2, boiler + " another distinct ending for document two ok fine sure"),
            (3, "totally separate words without any shared chunk at all"),
        ],
    )
    out = {r["doc_id"]: r for r in text.segment_dedup(df, seg_tokens=10).collect()}
    # the shared 10-token prefix chunk is boilerplate and removed
    assert "one two three" not in out[1]["text_clean"]
    assert out[1]["text_clean"].startswith("unique tail")
    assert out[2]["text_clean"].startswith("another distinct")
    # doc 3 untouched
    assert out[3]["n_kept"] == out[3]["n_segs"]
    assert out[3]["text_clean"] == "totally separate words without any shared chunk at all"


def test_segment_dedup_fully_boilerplate_doc_kept_empty(spark):
    t = "a b c d e f g h i j"
    df = _docs(spark, [(1, t), (2, t), (3, t + " extra tokens beyond the shared part here")])
    out = {r["doc_id"]: r for r in text.segment_dedup(df, seg_tokens=10).collect()}
    assert out[1]["text_clean"] == "" and out[1]["n_kept"] == 0
    assert out[1]["n_segs"] == 1
    assert out[3]["text_clean"] == "extra tokens beyond the shared part here"


def test_segment_dedup_order_preserved(spark):
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    df = _docs(
        spark,
        [
            (1, "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10 " + shared + " t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
            (2, shared),
        ],
    )
    out = {r["doc_id"]: r for r in text.segment_dedup(df, seg_tokens=10).collect()}
    assert out[1]["text_clean"] == "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"


def test_segment_dedup_delimiter_mode(spark):
    df = _docs(
        spark,
        [
            (1, "shared boilerplate line\nunique one"),
            (2, "shared boilerplate line\nunique two"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in text.segment_dedup(df, delimiter="\n", min_docs=2).collect()
    }
    assert out[1]["text_clean"] == "unique one"
    assert out[2]["text_clean"] == "unique two"
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 1
