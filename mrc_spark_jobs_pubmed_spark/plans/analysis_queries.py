"""Text-analysis queries over `documents` (operators in
mrc_spark_jobs_pubmed_spark.operators.textstats)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators import textstats as X
from mrc_spark_jobs_pubmed_spark.operators.dedup import tokens_col, tokens_sql
from mrc_spark_jobs_pubmed_spark.plans.registry import register
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

_TOKS_SQL = tokens_sql("text")


def _score_exprs_sql() -> dict[str, str]:
    return {
        lang: X.marker_hits_sql("toks", markers)
        for lang, markers in X.LANG_MARKERS.items()
    }


@register(
    "ta_langid",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang,
       {X.marker_hits_sql('toks', X.LANG_MARKERS['en'])} AS score_en,
       {X.marker_hits_sql('toks', X.LANG_MARKERS['de'])} AS score_de,
       {X.marker_hits_sql('toks', X.LANG_MARKERS['fr'])} AS score_fr,
       {X.predicted_lang_sql(_score_exprs_sql())} AS predicted_lang
FROM (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents)
""",
    doc="Language-ID heuristic: per-language marker-token hit counts with "
    "deterministic argmax. (The fixture's text is synthetic same-vocab "
    "soup, so the labeled lang column is not recoverable — the operator "
    "contract is the deterministic scoring itself.)",
)
def ta_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select("doc_id", F.col("lang").alias("labeled_lang"), tokens_col(F.col("text")).alias("toks"))
    scores = {
        lang: X.marker_hits(F.col("toks"), markers)
        for lang, markers in X.LANG_MARKERS.items()
    }
    return base.select(
        "doc_id",
        "labeled_lang",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        X.predicted_lang(scores).alias("predicted_lang"),
    )


@register(
    "ta_quality",
    oracle=f"""
SELECT doc_id,
       {X.quality_columns_sql('toks', 'text')['n_chars']} AS n_chars,
       {X.quality_columns_sql('toks', 'text')['n_tokens']} AS n_tokens,
       {X.quality_columns_sql('toks', 'text')['stopword_ratio']} AS stopword_ratio,
       {X.quality_columns_sql('toks', 'text')['distinct_ratio']} AS distinct_ratio,
       {X.quality_columns_sql('toks', 'text')['avg_token_len']} AS avg_token_len
FROM (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
""",
    doc="Quality signals per doc: char/token counts, stopword ratio, "
    "distinct-token ratio, mean token length — all integer-division "
    "doubles, bit-identical across engines.",
)
def ta_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select("doc_id", "text", tokens_col(F.col("text")).alias("toks"))
    cols = X.quality_columns(F.col("toks"), F.col("text"))
    return base.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@register(
    "ta_token_counts",
    oracle=f"""
SELECT doc_id,
       len({_TOKS_SQL}) AS ws_tokens,
       {X.bpe_token_count_sql('text')} AS bpe_tokens
FROM documents
""",
    doc="Token counting two ways: whitespace tokens and a BPE-ish regex "
    "(word pieces | digit runs | symbols) via regexp_extract_all — the "
    "pre-tokenizer count an LLM-pipeline budgets with.",
)
def ta_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("ws_tokens"),
        X.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


@register(
    "ta_fingerprint",
    oracle=f"""
SELECT doc_id,
       {X.fingerprint_sql('text')} AS fingerprint,
       md5({X.normalized_text_sql('text')}) AS md5_full
FROM documents
""",
    doc="Document fingerprinting: normalized (lower + whitespace-collapse) "
    "sha256 prefix + full md5 — cross-engine-stable content identity for "
    "incremental dedup joins.",
)
def ta_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fingerprint"),
        F.md5(X.normalized_text(F.col("text"))).alias("md5_full"),
    )


# --- character-entropy quality signal ---------------------------------------


@register(
    "ta_char_entropy",
    oracle="""
WITH chars AS (
  SELECT doc_id, t.ch AS ch
  FROM (SELECT doc_id,
               list_filter(string_split(text, ''), c -> c <> '') AS cs
        FROM documents),
       unnest(cs) AS t(ch)
),
freqs AS (
  SELECT doc_id, ch, count(*) AS n FROM chars GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       round(-sum((n::DOUBLE / tot) * ln(n::DOUBLE / tot) / ln(2)), 6)
         AS entropy_bits
FROM (SELECT doc_id, ch, n, sum(n) OVER (PARTITION BY doc_id) AS tot FROM freqs)
GROUP BY doc_id
""",
    doc="Per-document character-level Shannon entropy (bits/char) with "
    "character counts — the classic gibberish/boilerplate quality "
    "signal (low entropy = repeated filler, high = encoded noise). "
    "Scale shape: the char explode never shuffles raw characters — "
    "the (doc_id, char) hash-agg's map-side partial collapses each "
    "doc to its ≤|alphabet| distinct-char counts before the exchange, "
    "and the per-doc total + final entropy agg both reuse the same "
    "doc_id partitioning (window + agg, no extra exchange). Entropy "
    "uses ln(p)/ln(2): IEEE-identical on both engines, rounded at 6dp "
    "only at the contract edge.",
)
def ta_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    freqs = (
        # both engines split '' into [''] — drop the phantom empty char so
        # an empty doc contributes no rows instead of one '' char
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", ""), lambda c: c != F.lit(""))
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("doc_id"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        freqs.withColumn("tot", tot)
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_chars"),
            F.count("*").cast("long").alias("n_distinct_chars"),
            F.round(-F.sum(p * F.log(p) / F.log(F.lit(2.0))), 6).alias(
                "entropy_bits"
            ),
        )
    )
