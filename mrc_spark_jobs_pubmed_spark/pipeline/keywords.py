"""Keyword-extraction stage: the reference's two keyword jobs.

v1 (spark-pubmed-word-count/word_count.py): abstracts → distinct cleaned
lemmatized non-stopword tokens → (word, pmid) pairs (README golden
example: spark-pubmed-word-count/README.md:4-15).

v2 (extract-keywords-from-abstracts/extract_keywords_from_all_abstracts.py):
NDJSON articles → (pmid, keywords, year) CSV rows, POS-aware lemmas.

Both are one `select` over the composable text pipeline
(functions/text.py) — the per-file Python closures (word_count.py:41-65)
become Catalyst expressions end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.functions.text import keywords


def keywords_v1(articles: DataFrame) -> DataFrame:
    """(word, pmid) pairs — the reference v1 output shape (A25)."""
    return articles.select(
        F.explode(keywords(F.col("abstract"))).alias("word"), "pmid"
    )


def keywords_v2(articles: DataFrame, use_nltk: bool = False) -> DataFrame:
    """(pmid, keywords, year) — the reference v2 output shape: one row per
    article, keywords joined with ' ' (the pandas-accumulated CSV of
    extract_keywords_from_all_abstracts.py:93-103, minus the driver-side
    accumulation)."""
    kw = keywords(F.col("abstract"))
    return articles.select(
        "pmid",
        F.concat_ws(" ", F.array_sort(kw)).alias("keywords"),
        "year",
    )
