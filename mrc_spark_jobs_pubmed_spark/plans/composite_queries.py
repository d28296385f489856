"""Capstone composite: the whole LLM corpus-prep pipeline as ONE plan.

quality filter ∧ language-ID keep ∧ exact-dedup canonical ∧ MinHash-LSH
near-dup drop — the stages every training-data pipeline chains, composed
from the same operator builders the individual queries use, so Catalyst
sees a single plan (shared scans, pushed filters) rather than four
materialized passes. The oracle assembles the same stages from the
shared SQL builders, value-checking the full composition end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators import dedup as D
from mrc_spark_jobs_pubmed_spark.operators import textstats as X
from mrc_spark_jobs_pubmed_spark.operators.dedup import tokens_sql
from mrc_spark_jobs_pubmed_spark.plans.registry import register
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

MIN_TOKENS = 5
MIN_DISTINCT_RATIO = 0.3
KEEP_LANG = "en"


def _oracle() -> str:
    q = X.quality_columns_sql("toks", "text")
    scores = {
        lang: X.marker_hits_sql("toks", markers)
        for lang, markers in X.LANG_MARKERS.items()
    }
    return f"""
WITH bands AS ({D.minhash_band_keys_sql()}),
drops AS (
  SELECT DISTINCT b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
feats AS (
  SELECT doc_id,
         {q['n_tokens']} AS n_tokens,
         {q['distinct_ratio']} AS distinct_ratio,
         {X.predicted_lang_sql(scores)} AS predicted_lang,
         min(doc_id) OVER (PARTITION BY sha256(text)) AS canon
  FROM (SELECT doc_id, text, {tokens_sql('text')} AS toks FROM documents)
)
SELECT doc_id, n_tokens, predicted_lang
FROM feats
WHERE n_tokens >= {MIN_TOKENS}
  AND distinct_ratio >= {MIN_DISTINCT_RATIO}
  AND predicted_lang = '{KEEP_LANG}'
  AND doc_id = canon
  AND doc_id NOT IN (SELECT doc_b FROM drops)
"""


@register(
    "llm_corpus_prep",
    oracle=_oracle(),
    doc="End-to-end corpus prep in one Catalyst plan: quality gate "
    "(token count + distinct ratio), language keep (marker-argmax), "
    "exact-dup canonicalization (min doc_id per sha256, via window), "
    "and MinHash-LSH near-dup drop (anti-join against candidate-pair "
    "right sides). The oracle rebuilds the identical composition from "
    "the shared SQL builders.",
)
def llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id", "text", D.tokens_col(F.col("text")).alias("toks")
    )
    quality = X.quality_columns(F.col("toks"), F.col("text"))
    scores = {
        lang: X.marker_hits(F.col("toks"), markers)
        for lang, markers in X.LANG_MARKERS.items()
    }
    feats = base.select(
        "doc_id",
        quality["n_tokens"].alias("n_tokens"),
        quality["distinct_ratio"].alias("distinct_ratio"),
        X.predicted_lang(scores).alias("predicted_lang"),
        F.min("doc_id")
        .over(Window.partitionBy(F.sha2(F.col("text"), 256)))
        .alias("canon"),
    )
    kept = feats.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
        & (F.col("predicted_lang") == KEEP_LANG)
        & (F.col("doc_id") == F.col("canon"))
    )
    drops = D.lsh_candidate_pairs(
        D.minhash_band_keys(D.shingle_rows(docs, distinct=False))
    ).select(F.col("doc_b"))
    return kept.join(
        drops, kept.doc_id == drops.doc_b, "left_anti"
    ).select("doc_id", "n_tokens", "predicted_lang")
