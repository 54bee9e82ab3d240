"""Driver-contract queries for the §7.4 extension operators (dedup,
similarity search, text analysis, event-time ops, multimodal plumbing)
with DuckDB oracles where SQL-expressible.

Parity techniques (same discipline as contract.py):
- md5 is byte-identical across engines → all text hashing/minhash.
- Jaccard / ratios: integer counts into one division.
- Embeddings: quantized to ints (round(e*1000)) → exact dot products;
  cosine = one division of exact values.
- Event value sums: decimal(18,2) cast → exact, order-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, events, similarity, text
from gedixr_spark.operators.multimodal import attach_fake_payload


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from gedixr_spark.operators.skew import fan_out

    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        return fan_out(load_events(spark, sf_dir), memo_key=path)
    return fan_out(spark.read.parquet(path), memo_key=path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores TIMESTAMP(NANOS) parquet, which Spark 4
    rejects by default. Read nanos as long (runtime conf, so it works
    under the driver's session too) and floor-divide to microseconds —
    exactly what DuckDB's parquet reader does (verified: ns remainders
    ≥ 500 are floored, not rounded), so oracle parity holds."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # events timestamps are instants; pin the session to UTC so
    # date_trunc/month agree with DuckDB's naive reading even if the
    # driver's session runs in another timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5-of-normalized-text survivor table."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark, sf_dir):
    """Bag-of-words fingerprint dedup key per doc."""
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", text.doc_fingerprint("text").alias("fingerprint"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs at 0.5."""
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), 0.5)


def q_minhash_signature(spark, sf_dir):
    """8-hash MinHash signatures (seeded md5 minima)."""
    return dedup.minhash_signature(_t(spark, sf_dir, "documents"), k=4)


def q_minhash_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs (k=4, 2 bands of 2)."""
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), k=4, bands=2)


def q_minhash_lsh_neardup(spark, sf_dir):
    """Full scale dedup pipeline: LSH candidates → exact Jaccard verify
    at 0.5 (recall bounded by banding; the oracle replays the same
    candidate restriction)."""
    return dedup.minhash_lsh_neardup(
        _t(spark, sf_dir, "documents"), threshold=0.5, k=4, bands=2
    )


def q_simhash(spark, sf_dir):
    """16-bit SimHash fingerprints."""
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", dedup.simhash16("text").alias("simhash"))


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the LSH near-dup pair graph — the
    cluster/survivor assignment step of real dedup. Iterative on the
    Spark side; the oracle is a DuckDB recursive CTE computing the
    same min-reachable-id labels, so convergence is fully checked."""
    pairs = dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), k=4, bands=2)
    return dedup.dedup_clusters(pairs)


def q_dedup_apply(spark, sf_dir):
    """End-to-end near-dedup: LSH pairs → connected components →
    drop non-survivors from the corpus (the full pipeline the other
    dedup queries build up to)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, k=4, bands=2)
    clusters = dedup.dedup_clusters(pairs)
    return dedup.apply_dedup(docs, clusters).select("doc_id", "lang", "source")


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test split by md5 bucket (90/5/5)."""
    from gedixr_spark.operators import sampling

    df = sampling.hash_split(_t(spark, sf_dir, "documents"))
    return df.select("doc_id", "bucket", "split")


def q_simhash_neardup(spark, sf_dir):
    """SimHash hamming-≤3 near-dup pairs via exact 4-band pigeonhole
    candidates; oracle is the all-pairs hamming filter (equivalent by
    the completeness guarantee, checked end-to-end)."""
    return dedup.simhash_neardup_pairs(_t(spark, sf_dir, "documents"), max_dist=3)


def q_repetition(spark, sf_dir):
    """Gopher-style repetition signals (shuffle-free per-doc fold)."""
    df = text.repetition_features(_t(spark, sf_dir, "documents"))
    return df.select("doc_id", "dup_token_ratio", "top_bigram_ratio")


def q_contamination(spark, sf_dir):
    """Benchmark decontamination audit: docs sharing a 3-shingle with
    the deterministic 'benchmark' subset (doc_id % 97 == 0)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return text.contamination(docs, bench)


def q_pii_redact(spark, sf_dir):
    """PII audit + redaction. The synthetic corpus has no PII, so the
    query plants a deterministic email + dotted-quad per doc first —
    the operator then has real matches to count and redact."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    out = text.redact_pii(text.pii_features(docs))
    return out.select("doc_id", "n_email", "n_ipv4", "text_redacted")


def q_blocklist_filter(spark, sf_dir):
    """Broadcast anti-join source blocklist (C4-style source cleanup)."""
    docs = _t(spark, sf_dir, "documents")
    out = text.blocklist_filter(docs, ["src3", "src7", "src13"])
    return out.select("doc_id", "source")


def q_stratified_sample(spark, sf_dir):
    """Per-language deterministic sample (en 50% / de 30% / fr 20%,
    other languages dropped) — one map-side predicate, no RNG."""
    from gedixr_spark.operators import sampling

    df = sampling.stratified_sample(
        _t(spark, sf_dir, "documents"), "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}
    )
    return df.select("doc_id", "lang", "bucket")


# ---------------------------------------------------------------------------
# Similarity
# ---------------------------------------------------------------------------


def q_cosine_topk(spark, sf_dir):
    """Brute-force quantized-cosine top-5 for query vectors vec_id<3."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb.filter(F.col("vec_id") < 3), emb, k=5)


def q_embedding_neardup(spark, sf_dir):
    """LSH-bucketed embedding near-dup pairs (cosine ≥ 0.3 — the
    synthetic embeddings are random unit vectors, so 'near-dup' means
    top-tail cosine; real corpora would use ≥ 0.95)."""
    return similarity.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=8
    )


def q_ann_topk(spark, sf_dir):
    """LSH-bucketed ANN top-3 for query vectors vec_id<5 — the scale
    path for similarity search (only same-bucket candidates scored)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(emb.filter(F.col("vec_id") < 5), emb, k=3, n_planes=8)


def q_ivf_cells(spark, sf_dir):
    """IVF cell histogram (the inverted-file partitioning shape)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(64, 8, 7)
    return (
        emb.select(similarity.ivf_cell("embedding", cents).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN top-3 (nprobe=1) for query vectors vec_id<5."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_topk(emb.filter(F.col("vec_id") < 5), emb, k=3, n_cells=8)


def q_kmeans_clusters(spark, sf_dir):
    """Distributed k-means cluster sizes (k=8, 3 Lloyd iterations —
    iterative algorithms bound cost, not epsilon; deterministic init).
    Iterative ⇒ intentionally no SQL oracle; the driver records the
    rows-only check (per the build brief's rule)."""
    from gedixr_spark.operators.clustering import kmeans_cluster_sizes

    return kmeans_cluster_sizes(_t(spark, sf_dir, "embeddings"), k=8, n_iter=3)


def q_lsh_buckets(spark, sf_dir):
    """Hyperplane-LSH bucket histogram (the ANN partitioning shape)."""
    emb = _t(spark, sf_dir, "embeddings")
    planes = similarity.hyperplanes(64, 8, 42)
    return (
        emb.select(similarity.lsh_bucket("embedding", planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_token_counts(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        text.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        text.regex_token_count("text").alias("n_regex_tokens"),
    )


def q_tfidf_topk(spark, sf_dir):
    """Top-3 characteristic terms per doc by tf·(N/df) rank."""
    return text.tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


def q_text_quality(spark, sf_dir):
    df = text.quality_features(_t(spark, sf_dir, "documents"))
    return df.select(
        "doc_id", "n_tokens", "mean_token_len", "stopword_ratio", "upper_ratio"
    )


def q_lang_id(spark, sf_dir):
    df = text.lang_id(_t(spark, sf_dir, "documents"))
    return df.select("doc_id", "lang", "lang_pred")


def q_rolling_hash(spark, sf_dir):
    """Order-sensitive document fingerprint (Rabin-Karp polynomial fold
    over token digests)."""
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", text.rolling_hash("text").alias("rhash"))


def q_word_topk(spark, sf_dir):
    """Corpus-level token frequency top-20 (explode → count → rank)."""
    df = _t(spark, sf_dir, "documents")
    toks = df.select(F.explode(text.tokens("text")).alias("token"))
    from pyspark.sql.window import Window

    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 20)


# ---------------------------------------------------------------------------
# Events
# ---------------------------------------------------------------------------


def q_tumbling_hourly(spark, sf_dir):
    return events.tumbling_agg(_t(spark, sf_dir, "events"))


def q_sliding_2h(spark, sf_dir):
    return events.sliding_agg(_t(spark, sf_dir, "events"))


def q_sessionize(spark, sf_dir):
    s = events.sessionize(_t(spark, sf_dir, "events"))
    return s.select("event_id", "user_id", "session_n")


def q_session_stats(spark, sf_dir):
    return events.session_stats(_t(spark, sf_dir, "events"))


def q_top_users(spark, sf_dir):
    return events.top_users_by_activity(_t(spark, sf_dir, "events"), k=10)


def q_props_extract(spark, sf_dir):
    df = events.json_props_extract(_t(spark, sf_dir, "events"))
    return df.select("event_id", "prop_k")


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary column; oracle-checkable part)
# ---------------------------------------------------------------------------


def q_binary_payload_meta(spark, sf_dir):
    """Binary payload + typed metadata projection: the oracle checks
    payload bytes (via hex), byte length, and the metadata fields."""
    df = attach_fake_payload(_t(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        F.hex(F.col("payload")).alias("payload_hex"),
        F.length("payload").alias("n_bytes"),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"
_SHINGLES = f"""
  list_distinct(
    CASE WHEN len({_TOKENS}) >= 3
         THEN list_transform(range(1, len({_TOKENS}) - 1),
              i -> concat_ws(' ', {_TOKENS}[i], {_TOKENS}[i+1], {_TOKENS}[i+2]))
         ELSE [] END)
"""

_QVEC = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


def _dot_sql(a: str, b: str) -> str:
    """Exact integer dot product: reduce over the zipped product list."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> p[1] * p[2]), (x, y) -> x + y)"
    )


def _plane_proj_sql(vec: str, plane: list[float]) -> str:
    """Fixed left-assoc chain of quantized-element × literal products —
    mirrors similarity.lsh_bucket exactly."""
    terms = " + ".join(f"{vec}[{j + 1}] * {w!r}" for j, w in enumerate(plane))
    return f"({terms})"


def _lsh_bucket_sql(planes: list[list[float]]) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_plane_proj_sql('qv', p)} > 0 THEN {2 ** i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"({bits})"


def _hex4_sql(h: str) -> str:
    """First-4-hex-digits of the md5-string expression ``h`` as an int
    (mirrors F.conv(substring(md5, 1, 4), 16, 10))."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
            for i in range(4)
        )
        + ")"
    )


_STOPWORDS_SQL = "['the','a','and','of','to','in','is','it']"


def _lang_score(markers: tuple[str, ...]) -> str:
    arr = "[" + ",".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter(list_transform({_TOKENS}, t -> lower(t)), t -> list_contains({arr}, t)))"


def _ivf_cell_cte(centroids: list[list[int]]) -> str:
    """CTEs computing per-vector centroid dots d0..dk-1 and the argmax
    cell via a preference CASE chain (first max wins — matching
    numpy argmax)."""
    k = len(centroids)
    dots = ", ".join(
        f"{_plane_proj_sql('qv', c)} AS d{i}" for i, c in enumerate(centroids)
    )
    cases = []
    for i in range(k - 1):
        conds = " AND ".join(f"d{i} >= d{j}" for j in range(i + 1, k))
        cases.append(f"WHEN {conds} THEN {i}")
    argmax = "CASE " + " ".join(cases) + f" ELSE {k - 1} END"
    return (
        f"e AS (SELECT vec_id, {_QVEC} AS qv FROM embeddings),\n"
        f"d AS (SELECT vec_id, qv, {dots} FROM e),\n"
        f"s AS (SELECT vec_id, qv, {argmax} AS cell FROM d)"
    )


def build_oracles() -> dict[str, str]:
    from gedixr_spark.operators.similarity import hyperplanes, ivf_centroids
    from gedixr_spark.operators.text import LANG_MARKERS

    planes = hyperplanes(64, 8, 42)
    centroids = ivf_centroids(64, 8, 7)

    lang_cases = []
    langs = list(LANG_MARKERS)
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"{_lang_score(LANG_MARKERS[lang])} >= {_lang_score(LANG_MARKERS[o])}"
            for o in langs[i + 1 :]
        )
        lang_cases.append(f"WHEN {conds} THEN '{lang}'")
    lang_case_sql = "CASE " + " ".join(lang_cases) + f" ELSE '{langs[-1]}' END"

    # 16-bit simhash: digit = first-4-hex-chars of md5(token) as int
    digit = (
        "(strpos('0123456789abcdef', substr(md5(t),1,1)) - 1) * 4096 + "
        "(strpos('0123456789abcdef', substr(md5(t),2,1)) - 1) * 256 + "
        "(strpos('0123456789abcdef', substr(md5(t),3,1)) - 1) * 16 + "
        "(strpos('0123456789abcdef', substr(md5(t),4,1)) - 1)"
    )
    sim_bits = " + ".join(
        f"(CASE WHEN sum(((d // {2 ** i}) % 2) * 2 - 1) > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(16)
    )
    # 32-bit variant for the near-dup query: digit = first 8 md5 hex
    # chars as a BIGINT, sign-sum per bit as above
    digit8 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(t),{i + 1},1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    sim_bits32 = " + ".join(
        f"(CASE WHEN sum(((d // {2 ** i}) % 2) * 2 - 1) > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)"
        for i in range(32)
    )

    oracles = {
        "dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_key,
                   min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "doc_fingerprint": f"""
            SELECT doc_id,
                   md5(list_aggregate(list_sort(list_distinct({_TOKENS})), 'string_agg', ' '))
                     AS fingerprint
            FROM documents
        """,
        "ngram_jaccard_pairs": f"""
            WITH sh AS (
              SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        """,
        "minhash_signature": f"""
            WITH sh AS (
              SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
            )
            SELECT doc_id,
                   min(md5(concat('0|', shingle))) AS mh0,
                   min(md5(concat('1|', shingle))) AS mh1,
                   min(md5(concat('2|', shingle))) AS mh2,
                   min(md5(concat('3|', shingle))) AS mh3
            FROM sh GROUP BY 1
        """,
        "minhash_lsh_pairs": f"""
            WITH sh AS (
              SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
            ),
            sig AS (
              SELECT doc_id,
                     min(md5(concat('0|', shingle))) AS mh0,
                     min(md5(concat('1|', shingle))) AS mh1,
                     min(md5(concat('2|', shingle))) AS mh2,
                     min(md5(concat('3|', shingle))) AS mh3
              FROM sh GROUP BY 1
            ),
            banded AS (
              SELECT doc_id, md5(concat_ws('|', mh0, mh1)) AS band_key FROM sig
              UNION ALL
              SELECT doc_id, md5(concat_ws('|', mh2, mh3)) AS band_key FROM sig
            )
            SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
            FROM banded x JOIN banded y
              ON x.band_key = y.band_key AND x.doc_id < y.doc_id
        """,
        "minhash_lsh_neardup": f"""
            WITH sh AS (
              SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
            ),
            sig AS (
              SELECT doc_id,
                     min(md5(concat('0|', shingle))) AS mh0,
                     min(md5(concat('1|', shingle))) AS mh1,
                     min(md5(concat('2|', shingle))) AS mh2,
                     min(md5(concat('3|', shingle))) AS mh3
              FROM sh GROUP BY 1
            ),
            banded AS (
              SELECT doc_id, md5(concat_ws('|', mh0, mh1)) AS band_key FROM sig
              UNION ALL
              SELECT doc_id, md5(concat_ws('|', mh2, mh3)) AS band_key FROM sig
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM banded x JOIN banded y
                ON x.band_key = y.band_key AND x.doc_id < y.doc_id
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            exact AS (
              SELECT id_a, id_b,
                     CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
            )
            SELECT exact.id_a, exact.id_b, jaccard
            FROM cand JOIN exact ON cand.id_a = exact.id_a AND cand.id_b = exact.id_b
        """,
        "dedup_apply": f"""
            WITH RECURSIVE sh AS (
              SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
            ),
            sig AS (
              SELECT doc_id,
                     min(md5(concat('0|', shingle))) AS mh0,
                     min(md5(concat('1|', shingle))) AS mh1,
                     min(md5(concat('2|', shingle))) AS mh2,
                     min(md5(concat('3|', shingle))) AS mh3
              FROM sh GROUP BY 1
            ),
            banded AS (
              SELECT doc_id, md5(concat_ws('|', mh0, mh1)) AS band_key FROM sig
              UNION ALL
              SELECT doc_id, md5(concat_ws('|', mh2, mh3)) AS band_key FROM sig
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM banded x JOIN banded y
                ON x.band_key = y.band_key AND x.doc_id < y.doc_id
            ),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM cand
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM cand
            ),
            reach AS (
              SELECT DISTINCT u AS node, u AS r FROM edges
              UNION
              SELECT e.u AS node, reach.r FROM edges e JOIN reach ON e.v = reach.node
            ),
            losers AS (
              SELECT node FROM reach GROUP BY node HAVING node <> min(r)
            )
            SELECT doc_id, lang, source FROM documents
            WHERE doc_id NOT IN (SELECT node FROM losers)
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE sh AS (
              SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
            ),
            sig AS (
              SELECT doc_id,
                     min(md5(concat('0|', shingle))) AS mh0,
                     min(md5(concat('1|', shingle))) AS mh1,
                     min(md5(concat('2|', shingle))) AS mh2,
                     min(md5(concat('3|', shingle))) AS mh3
              FROM sh GROUP BY 1
            ),
            banded AS (
              SELECT doc_id, md5(concat_ws('|', mh0, mh1)) AS band_key FROM sig
              UNION ALL
              SELECT doc_id, md5(concat_ws('|', mh2, mh3)) AS band_key FROM sig
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM banded x JOIN banded y
                ON x.band_key = y.band_key AND x.doc_id < y.doc_id
            ),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM cand
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM cand
            ),
            reach AS (
              SELECT DISTINCT u AS node, u AS r FROM edges
              UNION
              SELECT e.u AS node, reach.r FROM edges e JOIN reach ON e.v = reach.node
            )
            SELECT node AS doc_id, min(r) AS cluster_id,
                   (node = min(r)) AS is_survivor
            FROM reach GROUP BY node
        """,
        "hash_split": f"""
            WITH b AS (
              SELECT doc_id,
                     ({_hex4_sql("md5(concat('split|', CAST(doc_id AS VARCHAR)))")} * 10000) // 65536
                       AS bucket
              FROM documents
            )
            SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
                   CASE WHEN bucket < 9000 THEN 'train'
                        WHEN bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "stratified_sample": f"""
            WITH b AS (
              SELECT doc_id, lang,
                     ({_hex4_sql("md5(concat('sample|', CAST(doc_id AS VARCHAR)))")} * 10000) // 65536
                       AS bucket
              FROM documents
            )
            SELECT doc_id, lang, CAST(bucket AS INTEGER) AS bucket
            FROM b
            WHERE bucket < CASE lang WHEN 'en' THEN 5000
                                     WHEN 'de' THEN 3000
                                     WHEN 'fr' THEN 2000
                                     ELSE -1 END
        """,
        "tfidf_topk": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            total AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
            scored AS (
              SELECT doc_id, term, tf, df,
                     CAST(tf * n_docs AS DOUBLE) / df AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN total
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tfidf DESC, term ASC) AS rnk
              FROM scored
            )
            SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INTEGER) AS rnk
            FROM ranked WHERE rnk <= 3
        """,
        "ann_topk": f"""
            WITH e AS (SELECT vec_id, {_QVEC} AS qv FROM embeddings),
            s AS (SELECT vec_id, qv, {_lsh_bucket_sql(planes)} AS bucket FROM e),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                     {_dot_sql('q.qv', 'c.qv')}
                       / (sqrt({_dot_sql('q.qv', 'q.qv')}) * sqrt({_dot_sql('c.qv', 'c.qv')}))
                       AS cosine
              FROM s q JOIN s c
                ON q.bucket = c.bucket AND q.vec_id < 5 AND c.vec_id <> q.vec_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, cand_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, cand_id, cosine, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "simhash": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
            ),
            dig AS (SELECT doc_id, {digit} AS d FROM tok)
            SELECT doc_id, {sim_bits} AS simhash
            FROM dig GROUP BY doc_id
        """,
        "simhash_neardup": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
            ),
            dig AS (SELECT doc_id, {digit8} AS d FROM tok),
            s AS (SELECT doc_id, {sim_bits32} AS sig FROM dig GROUP BY doc_id)
            SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                   CAST(bit_count(xor(x.sig, y.sig)) AS INTEGER) AS hamming
            FROM s x JOIN s y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.sig, y.sig)) <= 3
        """,
        "repetition": f"""
            WITH base AS (
              SELECT doc_id, {_TOKENS} AS toks, len({_TOKENS}) AS n FROM documents
            ),
            bg AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, n),
                            i -> concat_ws(' ', toks[i], toks[i+1]))) AS bigram
              FROM base WHERE n >= 2
            ),
            bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
            mx AS (SELECT doc_id, max(c) AS best FROM bgc GROUP BY 1)
            SELECT b.doc_id,
                   CASE WHEN n > 0
                        THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n
                   END AS dup_token_ratio,
                   CASE WHEN n >= 2 THEN CAST(best AS DOUBLE) / (n - 1)
                   END AS top_bigram_ratio
            FROM base b LEFT JOIN mx USING (doc_id)
        """,
        "pii_redact": r"""
            WITH aug AS (
              SELECT doc_id,
                     concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                            '@example.com ip 10.0.',
                            CAST(doc_id % 256 AS VARCHAR), '.1') AS text
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                        AS INTEGER) AS n_email,
                   CAST(len(regexp_extract_all(text,
                        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
                        AS INTEGER) AS n_ipv4,
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
                     '<IPV4>', 'g') AS text_redacted
            FROM aug
        """,
        "blocklist_filter": """
            SELECT doc_id, source FROM documents
            WHERE source NOT IN ('src3', 'src7', 'src13')
        """,
        "contamination": f"""
            WITH bench AS (
              SELECT DISTINCT unnest({_SHINGLES}) AS shingle
              FROM documents WHERE doc_id % 97 = 0
            ),
            corp AS (
              SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
            ),
            hits AS (
              SELECT doc_id, count(*) AS n_overlap
              FROM corp JOIN bench USING (shingle) GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(n_overlap, 0) AS n_overlap,
                   COALESCE(n_overlap, 0) >= 1 AS contaminated
            FROM documents d LEFT JOIN hits USING (doc_id)
        """,
        "cosine_topk": f"""
            WITH e AS (SELECT vec_id, {_QVEC} AS qv FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                     {_dot_sql('q.qv', 'c.qv')}
                       / (sqrt({_dot_sql('q.qv', 'q.qv')}) * sqrt({_dot_sql('c.qv', 'c.qv')}))
                       AS cosine
              FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id <> q.vec_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, cand_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, cand_id, cosine, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 5
        """,
        "embedding_neardup": f"""
            WITH e AS (
              SELECT vec_id, {_QVEC} AS qv FROM embeddings
            ),
            s AS (SELECT vec_id, qv, {_lsh_bucket_sql(planes)} AS bucket FROM e)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   {_dot_sql('a.qv', 'b.qv')}
                     / (sqrt({_dot_sql('a.qv', 'a.qv')}) * sqrt({_dot_sql('b.qv', 'b.qv')}))
                     AS cosine
            FROM s a JOIN s b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE {_dot_sql('a.qv', 'b.qv')}
                    / (sqrt({_dot_sql('a.qv', 'a.qv')}) * sqrt({_dot_sql('b.qv', 'b.qv')}))
                  >= 0.3
        """,
        "ivf_cells": f"""
            WITH {_ivf_cell_cte(centroids)}
            SELECT cell, count(*) AS n_vectors FROM s GROUP BY 1
        """,
        "ivf_ann_topk": f"""
            WITH {_ivf_cell_cte(centroids)},
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                     {_dot_sql('q.qv', 'c.qv')}
                       / (sqrt({_dot_sql('q.qv', 'q.qv')}) * sqrt({_dot_sql('c.qv', 'c.qv')}))
                       AS cosine
              FROM s q JOIN s c
                ON q.cell = c.cell AND q.vec_id < 5 AND c.vec_id <> q.vec_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, cand_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, cand_id, cosine, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "lsh_buckets": f"""
            WITH e AS (SELECT {_QVEC} AS qv FROM embeddings)
            SELECT {_lsh_bucket_sql(planes)} AS bucket, count(*) AS n_vectors
            FROM e GROUP BY 1
        """,
        "token_counts": f"""
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
                   CAST(len({_TOKENS})
                        + list_reduce(list_prepend(0,
                            list_transform({_TOKENS}, w -> CAST(length(w) // 6 AS BIGINT))),
                          (a, b) -> a + b) AS INTEGER) AS n_bpe_tokens,
                   CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER)
                     AS n_regex_tokens
            FROM documents
        """,
        "text_quality": f"""
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
                   CAST(list_reduce(list_prepend(0,
                          list_transform({_TOKENS}, w -> CAST(length(w) AS BIGINT))),
                        (a, b) -> a + b) AS DOUBLE) / len({_TOKENS}) AS mean_token_len,
                   CAST(len(list_filter({_TOKENS},
                        t -> list_contains({_STOPWORDS_SQL}, lower(t)))) AS DOUBLE)
                     / len({_TOKENS}) AS stopword_ratio,
                   CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                     / length(text) AS upper_ratio
            FROM documents
        """,
        "lang_id": f"""
            SELECT doc_id, lang, {lang_case_sql} AS lang_pred FROM documents
        """,
        "rolling_hash": f"""
            SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform({_TOKENS},
                         t -> CAST((strpos('0123456789abcdef', substr(md5(t),1,1)) - 1) * 4096
                              + (strpos('0123456789abcdef', substr(md5(t),2,1)) - 1) * 256
                              + (strpos('0123456789abcdef', substr(md5(t),3,1)) - 1) * 16
                              + (strpos('0123456789abcdef', substr(md5(t),4,1)) - 1) AS BIGINT))),
                     (acc, d) -> (acc * 31 + d) % 1000000007) AS rhash
            FROM documents
        """,
        "word_topk": f"""
            WITH tok AS (SELECT unnest({_TOKENS}) AS token FROM documents),
            counts AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
            ranked AS (
              SELECT token, n,
                     row_number() OVER (ORDER BY n DESC, token ASC) AS rank
              FROM counts
            )
            SELECT token, n, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 20
        """,
        "tumbling_hourly": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "sliding_2h": """
            WITH exploded AS (
              SELECT unnest([date_trunc('hour', ts),
                             date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
                     value
              FROM events
            )
            SELECT window_start, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM exploded GROUP BY 1
        """,
        "sessionize": """
            WITH lagged AS (
              SELECT event_id, user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events
            ),
            flagged AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN prev_ts IS NULL
                               OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END
                       AS is_new
              FROM lagged
            )
            SELECT event_id, user_id,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_n
            FROM flagged
        """,
        "session_stats": """
            WITH lagged AS (
              SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events
            ),
            flagged AS (
              SELECT *, CASE WHEN prev_ts IS NULL
                                  OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END
                          AS is_new
              FROM lagged
            ),
            sessions AS (
              SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_n
              FROM flagged
            )
            SELECT user_id, session_n, count(*) AS n_events,
                   epoch(max(ts)) - epoch(min(ts)) AS duration_s,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM sessions GROUP BY 1, 2
        """,
        "top_users": """
            WITH counts AS (
              SELECT user_id, count(*) AS n_events,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1
            ),
            ranked AS (
              SELECT *, row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS rank
              FROM counts
            )
            SELECT user_id, n_events, sum_value, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 10
        """,
        "props_extract": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
            FROM events
        """,
        "binary_payload_meta": """
            SELECT doc_id,
                   upper(md5(text)) AS payload_hex,
                   16 AS n_bytes,
                   'image/fake' AS media_type,
                   CAST(length(text) % 640 + 1 AS BIGINT) AS width,
                   CAST(length(text) % 480 + 1 AS BIGINT) AS height
            FROM documents
        """,
    }
    return oracles


def extension_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": q_dedup_exact,
        "doc_fingerprint": q_doc_fingerprint,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_signature": q_minhash_signature,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "minhash_lsh_neardup": q_minhash_lsh_neardup,
        "simhash": q_simhash,
        "simhash_neardup": q_simhash_neardup,
        "repetition": q_repetition,
        "contamination": q_contamination,
        "pii_redact": q_pii_redact,
        "blocklist_filter": q_blocklist_filter,
        "dedup_clusters": q_dedup_clusters,
        "dedup_apply": q_dedup_apply,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "tfidf_topk": q_tfidf_topk,
        "cosine_topk": q_cosine_topk,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "lsh_buckets": q_lsh_buckets,
        "ivf_cells": q_ivf_cells,
        "ivf_ann_topk": q_ivf_ann_topk,
        "kmeans_clusters": q_kmeans_clusters,  # rows-only: iterative
        "token_counts": q_token_counts,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "rolling_hash": q_rolling_hash,
        "word_topk": q_word_topk,
        "tumbling_hourly": q_tumbling_hourly,
        "sliding_2h": q_sliding_2h,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "top_users": q_top_users,
        "props_extract": q_props_extract,
        "binary_payload_meta": q_binary_payload_meta,
    }


ORACLES_EXT = build_oracles()
