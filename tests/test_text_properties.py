"""Property-based checks for the text pipeline (SURVEY.md §5 item 3).

Hypothesis drives arbitrary (including adversarial unicode) inputs
through the Column-expression pipeline in one Spark job per example
batch: cleaning idempotence, tokenizer shape, stopword-filter and
dedup set invariants. Batching examples into a single DataFrame keeps
the suite fast (one Spark action per property, not per example).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.functions import text as X
from mrc_spark_jobs_pubmed_spark.functions.stopwords import STOPWORDS

texts = st.lists(st.text(max_size=80), min_size=1, max_size=25)


def _pipe(spark, samples, *cols):
    df = spark.createDataFrame([(s,) for s in samples], ["raw"])
    return df.select(*cols).collect()


@settings(max_examples=15, deadline=None)
@given(texts)
def test_clean_text_is_idempotent_and_lowercase_alpha(spark, samples):
    rows = _pipe(
        spark,
        samples,
        X.clean_text(F.col("raw")).alias("once"),
        X.clean_text(X.clean_text(F.col("raw"))).alias("twice"),
    )
    for r in rows:
        assert r.once == r.twice  # applying the cleaner again changes nothing
        assert all(c.isalpha() or c == " " for c in r.once)
        assert r.once == r.once.lower()
        assert r.once == r.once.strip()


@settings(max_examples=15, deadline=None)
@given(texts)
def test_tokenize_has_no_empty_or_space_tokens(spark, samples):
    rows = _pipe(spark, samples, X.tokenize(X.clean_text(F.col("raw"))).alias("toks"))
    for r in rows:
        assert all(t and " " not in t for t in r.toks)


@settings(max_examples=15, deadline=None)
@given(texts)
def test_stopword_filter_is_subset_and_stopword_free(spark, samples):
    toks = X.tokenize(X.clean_text(F.col("raw")))
    rows = _pipe(
        spark,
        samples,
        toks.alias("toks"),
        X.remove_stopwords(toks).alias("kept"),
    )
    sw = set(STOPWORDS)
    for r in rows:
        assert set(r.kept) <= set(r.toks)
        assert not set(r.kept) & sw
        # array_except output carries Python-set semantics (A23/A24)
        assert len(r.kept) == len(set(r.kept))


@settings(max_examples=15, deadline=None)
@given(texts)
def test_distinct_tokens_is_set_and_order_preserving(spark, samples):
    toks = X.tokenize(X.clean_text(F.col("raw")))
    rows = _pipe(spark, samples, toks.alias("toks"), X.distinct_tokens(toks).alias("d"))
    for r in rows:
        assert len(r.d) == len(set(r.d))
        assert set(r.d) == set(r.toks)
        # first-occurrence order (the reference's dict/set iteration order)
        seen = [t for i, t in enumerate(r.toks) if t not in r.toks[:i]]
        assert r.d == seen
