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


def _funnel_oracle() -> str:
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
),
flags AS (
  SELECT doc_id,
         (n_tokens >= {MIN_TOKENS} AND distinct_ratio >= {MIN_DISTINCT_RATIO})
           AS q_ok,
         predicted_lang = '{KEEP_LANG}' AS lang_ok,
         doc_id = canon AS exact_ok,
         doc_id NOT IN (SELECT doc_b FROM drops) AS near_ok
  FROM feats
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS after_quality,
       CAST(sum(CASE WHEN q_ok AND lang_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS after_lang,
       CAST(sum(CASE WHEN q_ok AND lang_ok AND exact_ok THEN 1 ELSE 0 END)
            AS BIGINT) AS after_exact_dedup,
       CAST(sum(CASE WHEN q_ok AND lang_ok AND exact_ok AND near_ok
                     THEN 1 ELSE 0 END) AS BIGINT) AS after_near_dedup
FROM flags
"""


@register(
    "corpus_filter_funnel",
    oracle=_funnel_oracle(),
    doc="Pipeline-funnel diagnostic: survivor counts after each "
    "successive corpus-prep stage (quality gate → language keep → "
    "exact-dedup canonical → LSH near-dup drop) — the per-stage "
    "attrition table every production data pipeline dashboards before "
    "committing a corpus build. Computed from the SAME operator "
    "builders as llm_corpus_prep, in one pass: each stage becomes a "
    "boolean flag and the funnel is one aggregate of cumulative "
    "conjunctions (exact integers, order-independent) — no per-stage "
    "re-scan of the corpus.",
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    drops = D.lsh_candidate_pairs(
        D.minhash_band_keys(D.shingle_rows(docs, distinct=False))
    ).select(F.col("doc_b").alias("_drop_id")).distinct()
    flags = (
        feats.join(drops, feats.doc_id == F.col("_drop_id"), "left")
        .select(
            (
                (F.col("n_tokens") >= MIN_TOKENS)
                & (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
            ).alias("q_ok"),
            (F.col("predicted_lang") == KEEP_LANG).alias("lang_ok"),
            (F.col("doc_id") == F.col("canon")).alias("exact_ok"),
            F.col("_drop_id").isNull().alias("near_ok"),
        )
    )
    def _cum(*conds):
        c = None
        for x in conds:
            c = x if c is None else (c & x)
        return F.sum(F.when(c, 1).otherwise(0))

    return flags.agg(
        F.count("*").alias("n_total"),
        _cum(F.col("q_ok")).alias("after_quality"),
        _cum(F.col("q_ok"), F.col("lang_ok")).alias("after_lang"),
        _cum(F.col("q_ok"), F.col("lang_ok"), F.col("exact_ok")).alias(
            "after_exact_dedup"
        ),
        _cum(
            F.col("q_ok"), F.col("lang_ok"), F.col("exact_ok"), F.col("near_ok")
        ).alias("after_near_dedup"),
    )
