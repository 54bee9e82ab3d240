"""Corpus data card — the one-scan summary a dataset release ships
with (HuggingFace dataset-card / Datasheets-for-Datasets numbers):
volume, language mix, length distribution, duplication and quality
rails, all from ONE aggregation pass over one scan (profile_table's
cost discipline — the corpus is 100 TB, the card must not cost more
than a census).

Approximate where exactness buys nothing for a card
(approx_count_distinct for dup rate, percentile_approx for length
quantiles) and exact everywhere else; tests pin the exact facets
against DuckDB and the approximations against exact twins with
tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gedixr_spark.operators.dedup import normalized_text
from gedixr_spark.operators.text import token_count


def corpus_card(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> dict:
    """One-pass corpus summary dict; keys:

    - n_docs, n_chars_total, n_tokens_total
    - tokens_mean / tokens_p50 / tokens_p95
    - n_empty (null or whitespace-only docs)
    - exact_dup_rate: 1 − distinct(md5 of normalized text)/n  (HLL++,
      ±2%) — the pre-dedup health number
    - langs: {lang: n_docs} when ``lang_col`` exists — exact, via one
      extra low-cardinality groupBy (a card needs the real mix; the
      scalar metrics still ride a single scan)
    """
    toks = token_count(F.col(text_col))
    is_empty = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.length(text_col), F.lit(0))).alias("n_chars_total"),
        F.sum(F.coalesce(toks, F.lit(0))).alias("n_tokens_total"),
        F.avg(toks).alias("tokens_mean"),
        F.percentile_approx(toks, [0.5, 0.95], 10_000).alias("tokens_q"),
        F.sum(is_empty.cast("long")).alias("n_empty"),
        F.approx_count_distinct(F.md5(normalized_text(text_col)), 0.02).alias(
            "n_distinct_content"
        ),
    ]
    has_lang = lang_col is not None and lang_col in df.columns
    row = df.agg(*aggs).collect()[0]
    card = {
        "n_docs": row["n_docs"],
        "n_chars_total": int(row["n_chars_total"] or 0),
        "n_tokens_total": int(row["n_tokens_total"] or 0),
        "tokens_mean": float(row["tokens_mean"]) if row["tokens_mean"] is not None else None,
        "tokens_p50": float(row["tokens_q"][0]) if row["tokens_q"] else None,
        "tokens_p95": float(row["tokens_q"][1]) if row["tokens_q"] else None,
        "n_empty": row["n_empty"],
        "exact_dup_rate": (
            max(0.0, 1.0 - row["n_distinct_content"] / row["n_docs"])
            if row["n_docs"]
            else 0.0
        ),
    }
    if has_lang:
        card["langs"] = {
            r[lang_col]: r["n"]
            for r in df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
    return card
