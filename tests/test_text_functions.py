"""Golden + property tests for the text pipeline (SURVEY.md §5 items 2-3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.functions.text import (
    clean_text,
    keywords,
    lemmatize_tokens,
    remove_stopwords,
    tokenize,
)

GOLDEN_ABSTRACT = (
    "This article is a review of the different publications on breast cancer in men."
)
GOLDEN_PMID = "123456"
# spark-pubmed-word-count/README.md:5-15 — the reference's worked example.
GOLDEN_WORDS = {"article", "review", "different", "publication", "breast", "cancer", "man"}


def test_golden_example(spark):
    df = spark.createDataFrame([(GOLDEN_PMID, GOLDEN_ABSTRACT)], ["pmid", "abstract"])
    out = df.select("pmid", F.explode(keywords(F.col("abstract"))).alias("word"))
    rows = {(r.word, r.pmid) for r in out.collect()}
    assert rows == {(w, GOLDEN_PMID) for w in GOLDEN_WORDS}


def test_clean_strips_punct_digits_and_lowercases(spark):
    df = spark.createDataFrame([("Ab-1, C3d; e_f!",)], ["t"])
    assert df.select(clean_text(F.col("t")).alias("c")).first().c == "ab c d e f"


def test_tokenize_drops_empty(spark):
    df = spark.createDataFrame([("  a  b ",), ("",)], ["t"])
    got = [r.toks for r in df.select(tokenize(F.trim(F.col("t"))).alias("toks")).collect()]
    assert got == [["a", "b"], []]


def test_stopword_filter_is_subset_and_dedups(spark):
    df = spark.createDataFrame([(["the", "cat", "cat", "sat"],)], ["w"])
    got = df.select(remove_stopwords(F.col("w")).alias("w")).first().w
    assert sorted(got) == ["cat", "sat"]


def test_lemmatizer_rules(spark):
    cases = {
        "publications": "publication",
        "men": "man",
        "studies": "study",
        "classes": "class",
        "branches": "branch",
        "boxes": "box",
        "species": "species",
        "diabetes": "diabetes",
        "status": "status",
        "press": "press",
        "cat": "cat",
        "is": "is",
    }
    df = spark.createDataFrame([(list(cases),)], ["w"])
    got = df.select(lemmatize_tokens(F.col("w")).alias("w")).first().w
    assert dict(zip(cases, got)) == cases


def test_cleaning_is_idempotent(spark):
    df = spark.createDataFrame([("Mixed CASE 42 text!",), ("already clean",)], ["t"])
    once = df.select(clean_text(F.col("t")).alias("c"))
    twice = once.select(clean_text(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]
