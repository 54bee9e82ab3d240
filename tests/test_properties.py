"""Property-based checks (SURVEY.md §5.4): algebraic laws the operators
must satisfy on arbitrary inputs. Hypothesis generates the data; one
shared SparkSession keeps runs fast (examples are small by design)."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gedixr_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
from gedixr_spark.operators.events import sessionize
from gedixr_spark.operators.filters import quality_filter
from gedixr_spark.operators.joins import merge_products

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

shot_row = st.fixed_dictionaries(
    {
        "quality_flag": st.integers(0, 1),
        "degrade_flag": st.integers(0, 1),
        "num_detectedmodes": st.integers(0, 6),
        "elev": st.floats(0, 3000, allow_nan=False),
        "elev_dem_tdx": st.floats(-200, 3200, allow_nan=False),
    }
)


@given(rows=st.lists(shot_row, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_quality_filter_output_is_subset_and_predicate_holds(spark, rows):
    df = spark.createDataFrame(rows)
    out = quality_filter(df, drop_flags=False).collect()
    assert len(out) <= len(rows)
    for r in out:  # every surviving row satisfies the predicate exactly
        assert r["quality_flag"] == 1 and r["degrade_flag"] == 0
        assert r["num_detectedmodes"] > 0
        assert abs(r["elev"] - r["elev_dem_tdx"]) < 100


@given(
    keys=st.lists(st.integers(0, 50), min_size=1, max_size=15, unique=True),
    other=st.lists(st.integers(0, 50), min_size=1, max_size=15, unique=True),
)
@settings(**SETTINGS)
def test_merge_on_unique_keys_never_duplicates(spark, keys, other):
    ts = datetime.datetime(2020, 1, 1)
    l2a = spark.createDataFrame([(str(k), ts, k) for k in keys], ["shot", "acq_time", "rh98"])
    l2b = spark.createDataFrame([(str(k), ts, k / 10) for k in other], ["shot", "acq_time", "tcc"])
    out = merge_products(l2b, l2a, on=("shot", "acq_time"))
    n = out.count()
    assert n == len(set(keys) & set(other))  # inner join on unique keys
    assert out.select("shot").distinct().count() == n


@given(texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_exact_dedup_partitions_the_input(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = exact_dedup(df).collect()
    # group sizes partition the input; survivors are distinct ids
    assert sum(r["n_copies"] for r in out) == len(texts)
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))


@given(texts=st.lists(st.text(alphabet="xy z", min_size=6, max_size=40), min_size=2, max_size=8))
@settings(**SETTINGS)
def test_jaccard_pairs_bounded_and_ordered(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = ngram_jaccard_pairs(df, threshold=0.0, n=2).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert 0.0 < r["jaccard"] <= 1.0 + 1e-12


@given(
    gaps=st.lists(st.integers(1, 120), min_size=1, max_size=15),
)
@settings(**SETTINGS)
def test_sessionize_session_count_matches_gap_count(spark, gaps):
    """#sessions == 1 + #gaps>30min, for a single user's ordered events."""
    t = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    times = [t]
    for g in gaps:
        times.append(times[-1] + datetime.timedelta(minutes=g))
    rows = [(i, ts, 1, "e", 0.0) for i, ts in enumerate(times)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    out = sessionize(df, gap_minutes=30)
    n_sessions = out.agg({"session_n": "max"}).first()[0]
    assert n_sessions == 1 + sum(1 for g in gaps if g > 30)


@given(
    minutes=st.lists(st.integers(0, 600), min_size=1, max_size=20),
    width_slide=st.sampled_from([(60, 30), (90, 60), (120, 60), (45, 15)]),
)
@settings(**SETTINGS)
def test_sliding_agg_counts_every_containing_window(spark, minutes, width_slide):
    """Law: Σ n_events over windows == Σ over events of the number of
    slide-aligned windows [start, start+width) containing the event;
    every emitted window_start is on the slide grid."""
    from gedixr_spark.operators.events import sliding_agg

    width, slide = width_slide
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=m), 1.0)
        for i, m in enumerate(minutes)
    ]
    df = spark.createDataFrame(rows, "event_id int, ts timestamp, value double")
    out = sliding_agg(df, width, slide).collect()
    expected_total = 0
    for m in minutes:
        base_start = (m // slide) * slide
        expected_total += sum(
            1
            for j in range(-(-width // slide))  # ceil
            if (s := base_start - j * slide) <= m < s + width
        )
    assert sum(r["n_events"] for r in out) == expected_total
    for r in out:
        epoch_min = int(r["window_start"].timestamp()) // 60
        assert epoch_min % slide == 0


@given(
    corpus=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    bench=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=3, max_size=6).map(" ".join),
        min_size=1,
        max_size=3,
    ),
)
@settings(**SETTINGS)
def test_contamination_spans_are_merged_valid_intervals(spark, corpus, bench):
    """Laws: spans lie within the doc's token range, are non-empty,
    non-overlapping AND non-touching after merge, and a doc has spans
    iff contamination() flags it."""
    from gedixr_spark.operators.text import contamination, contamination_spans

    cdf = spark.createDataFrame(list(enumerate(corpus)), "doc_id int, text string")
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], "doc_id int, text string"
    )
    spans = contamination_spans(cdf, bdf).collect()
    flags = {r["doc_id"]: r["contaminated"] for r in contamination(cdf, bdf).collect()}
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for doc_id, ss in by_doc.items():
        n_tok = len([t for t in corpus[doc_id].split(" ") if t])
        ss.sort()
        prev_end = -1
        for s, e in ss:
            assert 0 <= s < e <= n_tok
            assert s > prev_end  # merged: no overlap, no touching
            prev_end = e
    assert set(by_doc) == {d for d, f in flags.items() if f}


@given(
    small_keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=30, unique=True),
    big_keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    m_exp=st.integers(8, 14),
    k=st.integers(1, 7),
)
@settings(**SETTINGS)
def test_bloom_semi_join_equals_set_semijoin(spark, small_keys, big_keys, m_exp, k):
    """bloom_semi_join(exact=True) must equal the plain set semi-join
    for ANY keys (negative hashes included) and any power-of-two
    m_bits/k combination; exact=False must be a superset (no false
    negatives ever)."""
    from gedixr_spark.operators.sketches import bloom_semi_join

    big = spark.createDataFrame([(v,) for v in big_keys], "key long")
    small = spark.createDataFrame([(v,) for v in small_keys], "key long")
    want = sorted(v for v in big_keys if v in set(small_keys))
    got = sorted(
        r["key"]
        for r in bloom_semi_join(big, small, on="key", m_bits=1 << m_exp, k=k).collect()
    )
    assert got == want
    approx = [
        r["key"]
        for r in bloom_semi_join(
            big, small, on="key", m_bits=1 << m_exp, k=k, exact=False
        ).collect()
    ]
    assert set(want) <= set(approx)


@given(
    xs=st.lists(st.one_of(st.none(), st.integers(-10**6, 10**6)), min_size=1, max_size=25),
    ss=st.lists(st.one_of(st.none(), st.text(alphabet="abcXYZ ", max_size=8)), min_size=1, max_size=25),
)
@settings(**SETTINGS)
def test_profile_table_matches_pandas(spark, xs, ss):
    """profile_table's exact facets (counts, nulls, min/max, mean,
    stddev) against pandas on arbitrary nullable int/string columns."""
    import pandas as _pd
    import pytest

    from gedixr_spark.operators.stats import profile_table

    n = max(len(xs), len(ss))
    xs = (xs + [None] * n)[:n]
    ss = (ss + [None] * n)[:n]
    df = spark.createDataFrame(list(zip(xs, ss)), "x long, s string")
    prof = {r["column"]: r for r in profile_table(df).collect()}
    pdf = _pd.DataFrame({"x": _pd.array(xs, dtype="Int64"), "s": ss})

    assert prof["x"]["n_rows"] == n
    assert prof["x"]["n_nulls"] == pdf["x"].isna().sum()
    assert prof["s"]["n_nulls"] == pdf["s"].isna().sum()
    nn = pdf["x"].dropna()
    if len(nn):
        assert int(prof["x"]["min_value"]) == nn.min()
        assert int(prof["x"]["max_value"]) == nn.max()
        assert prof["x"]["mean"] == pytest.approx(float(nn.mean()))
        if len(nn) >= 2:
            assert prof["x"]["stddev"] == pytest.approx(float(nn.std(ddof=1)))
    else:
        assert prof["x"]["min_value"] is None and prof["x"]["mean"] is None
    sn = pdf["s"].dropna()
    if len(sn):
        assert prof["s"]["min_value"] == sn.min()
        assert prof["s"]["max_value"] == sn.max()


@given(
    lines=st.lists(
        st.one_of(
            st.text(max_size=40).filter(lambda s: "\n" not in s and "\r" not in s),
            st.builds(
                lambda i, t: f'{{"doc_id": {i}, "text": "{t}"}}',
                st.integers(0, 100),
                st.text(alphabet="abc xyz", max_size=10),
            ),
        ),
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_jsonl_reader_never_crashes_and_partitions_lines(spark, lines, tmp_path_factory):
    """Fuzz: ANY byte salad in a dump → read_jsonl never raises, and
    good + quarantined exactly partition the non-blank lines."""
    from gedixr_spark.sources.jsonl import read_jsonl

    d = tmp_path_factory.mktemp("fuzz")
    p = d / "dump.jsonl"
    p.write_text("\n".join(lines) + "\n" if lines else "", encoding="utf-8")
    if not p.read_text(encoding="utf-8").strip():
        return  # empty dump: nothing to assert
    good, bad = read_jsonl(spark, str(p))
    n_nonblank = sum(1 for l in lines if l.strip())
    assert good.count() + bad.count() == n_nonblank


@given(
    base=st.dictionaries(st.integers(0, 30), st.integers(0, 100), min_size=1, max_size=15),
    updates=st.dictionaries(st.integers(0, 40), st.integers(0, 100), min_size=1, max_size=10),
)
@settings(**SETTINGS)
def test_merge_upsert_is_dict_merge(spark, base, updates, tmp_path_factory):
    """merge_upsert's semantics are exactly ``{**base, **updates}``
    for any keyed tables — replaced, carried, and inserted rows all
    land; nothing else does."""
    from gedixr_spark.sinks.merge import merge_upsert

    path = str(tmp_path_factory.mktemp("mu") / "t")
    spark.createDataFrame(list(base.items()), "id long, v long").write.parquet(path)
    upd = spark.createDataFrame(list(updates.items()), "id long, v long")
    merge_upsert(spark, path, upd, keys=["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {**base, **updates}


# --- versioned table: model-based sequence property -------------------------

_vt_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.dictionaries(st.integers(0, 5), st.text("abc", min_size=1, max_size=2),
                        min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete"), st.integers(0, 5)),
)


@given(ops=st.lists(_vt_op, min_size=1, max_size=4))
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_versioned_table_matches_dict_model(spark, tmp_path_factory, ops):
    """Any sequence of upserts/deletes: the latest snapshot equals the
    dict model, and EVERY historical snapshot equals the model's state
    at that point (time travel is total recall)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from gedixr_spark.sinks.versioned import (
        commit_delete, commit_upsert, init_versioned, read_versioned,
    )

    path = str(tmp_path_factory.mktemp("vtprop") / "t")
    init_versioned(spark, path)
    model: dict[int, str] = {}
    checkpoints: list[tuple[int, dict[int, str]]] = []
    for op in ops:
        if op[0] == "upsert":
            batch = op[1]
            df = spark.createDataFrame(
                [Row(k=k, v=v) for k, v in batch.items()]
            )
            entry = commit_upsert(spark, path, df, keys=["k"])
            model.update(batch)
            checkpoints.append((entry["version"], dict(model)))
        else:
            k = op[1]
            entry = commit_delete(spark, path, F.col("k") == k)
            model.pop(k, None)
            if entry.get("op") != "noop":
                checkpoints.append((entry["version"], dict(model)))
    for version, snap in checkpoints:
        got = {
            r["k"]: r["v"]
            for r in read_versioned(spark, path, version=version).collect()
        }
        assert got == snap, (version, got, snap)
