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


# --- POS-aware lemmatizer (A18/A19/A21) -------------------------------------


def test_penn_to_wordnet_map():
    from mrc_spark_jobs_pubmed_spark.functions.text import penn_to_wordnet

    # the reference's exact mapping (extract_keywords_from_all_abstracts.py:53-63)
    assert penn_to_wordnet("JJ") == "a"
    assert penn_to_wordnet("JJR") == "a"
    assert penn_to_wordnet("VBG") == "v"
    assert penn_to_wordnet("NNS") == "n"
    assert penn_to_wordnet("RB") == "r"
    assert penn_to_wordnet("DT") is None
    assert penn_to_wordnet("CC") is None


POS_LEMMA_CASES = {
    # verbs: -ing/-ed detachment with e-restoration
    "running": "run",
    "stopped": "stop",
    "studied": "study",
    "making": "make",
    "writing": "write",
    "compared": "compare",
    "observed": "observe",
    "observing": "observe",
    "increased": "increase",
    "decreasing": "decrease",
    "associated": "associate",
    "evaluating": "evaluate",
    "treated": "treat",
    "repeated": "repeat",
    "obtained": "obtain",
    "performed": "perform",
    "learning": "learn",
    "modeling": "model",
    "profiling": "profile",
    "failed": "fail",
    "imaging": "image",
    "analyzed": "analyze",
    "included": "include",
    "examined": "examine",
    "screening": "screen",
    # irregular verbs
    "found": "find",
    "made": "make",
    "shown": "show",
    "developed": "develop",
    "required": "require",
    "underlying": "underlie",
    # -ing/-ed words that are not inflected verbs
    "morning": "morning",
    "nothing": "nothing",
    "string": "string",
    "infrared": "infrared",
    "speed": "speed",
    "agreed": "agreed",
    # adverbs / adjectives: identity
    "quickly": "quickly",
    "significantly": "significantly",
    "various": "various",
    "effective": "effective",
    "clinical": "clinical",
    # nouns fall through to the noun rule table
    "publications": "publication",
    "men": "man",
    "studies": "study",
    "cells": "cell",
    "analysis": "analysis",
}


def test_pos_lemmatizer_rules(spark):
    from mrc_spark_jobs_pubmed_spark.functions.text import lemmatize_tokens_pos

    toks = sorted(POS_LEMMA_CASES)
    df = spark.createDataFrame([(toks,)], ["w"])
    got = df.select(lemmatize_tokens_pos(F.col("w")).alias("w")).first().w
    assert dict(zip(toks, got)) == {t: POS_LEMMA_CASES[t] for t in toks}


def test_pos_lemma_sql_mirror_matches_column(spark):
    """The generated DuckDB SQL must implement the SAME rules as the
    Column expression, token by token."""
    import duckdb

    from mrc_spark_jobs_pubmed_spark.functions.text import lemma_pos_sql

    toks = sorted(POS_LEMMA_CASES)
    rel = duckdb.sql(
        "SELECT " + lemma_pos_sql("tok") + " AS lemma "
        "FROM (SELECT unnest(" + str(toks) + ") AS tok)"
    )
    got = [r[0] for r in rel.fetchall()]
    assert dict(zip(toks, got)) == {t: POS_LEMMA_CASES[t] for t in toks}


def test_keywords_v2_golden(spark):
    """v2 pipeline end to end: POS lemmas + mrc list, reference order
    (lemmatize before stopword filter)."""
    from mrc_spark_jobs_pubmed_spark.pipeline.keywords import keywords_v2

    df = spark.createDataFrame(
        [
            (
                "9",
                "Comparing the observed results: 3 studies showed "
                "increased survival in treated men.",
                1999,
            )
        ],
        ["pmid", "abstract", "year"],
    )
    row = keywords_v2(df).first()
    assert row.pmid == "9"
    assert row.year == 1999
    # 'the/in' stopwords; 'results'→'result' is in the mrc list; 'showed'
    # →'show' likewise — both caught only AFTER lemmatization.
    assert row.keywords == "compare increase man observe study survival treat"
