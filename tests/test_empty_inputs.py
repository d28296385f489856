"""Degenerate-input behavior: a 100 TB engine constantly sees empty
partitions, empty filter results, and garbage rows (empty/whitespace
text). Every corpus-facing operator must return a well-formed result —
never a crash, never a NULL-poisoned aggregate — on the empty relation
and on degenerate documents."""

from __future__ import annotations

import pytest

from mrc_spark_jobs_pubmed_spark.operators import dedup as D

DOC_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    # NULL, empty string, whitespace-only, single token, and a real doc
    return spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "one"), (4, "a b c d e f g h i j")],
        DOC_SCHEMA,
    )


@pytest.mark.parametrize(
    "op",
    [
        D.exact_dedup_groups,
        D.simhash_fingerprints,
        D.span_coverage,
        D.span_trim,
        D.drop_common_lines,
        lambda df: D.minhash_band_keys(D.shingle_rows(df, distinct=False)),
        lambda df: D.jaccard_pairs(D.shingle_rows(df)),
    ],
    ids=[
        "exact_dedup",
        "simhash",
        "span_coverage",
        "span_trim",
        "line_dedup",
        "minhash_bands",
        "jaccard_pairs",
    ],
)
def test_empty_relation_yields_empty_result(empty_docs, op):
    assert op(empty_docs).count() == 0


def test_degenerate_docs_keep_per_doc_contracts(degenerate_docs):
    # per-doc operators must emit one well-formed row per input doc:
    # zeros for empty/short text, NULL (unknown) — never an abort or a
    # dropped row — for NULL text
    cov = {r.doc_id: r for r in D.span_coverage(degenerate_docs).collect()}
    assert set(cov) == {0, 1, 2, 3, 4}
    for d in (1, 2, 3, 4):
        r = cov[d]
        # below SPAN_W tokens nothing can be duplicated
        assert (r.dup_spans, r.dup_tokens, r.dup_frac) == (0, 0, 0.0)
    assert cov[1].n_tokens == 0 and cov[3].n_tokens == 1
    assert cov[0].n_tokens is None and cov[0].dup_spans == 0

    trim = {r.doc_id: r for r in D.span_trim(degenerate_docs).collect()}
    assert set(trim) == {0, 1, 2, 3, 4}
    assert trim[1].text_trimmed == "" and trim[1].n_kept == 0
    assert trim[0].text_trimmed == "" and trim[0].n_kept == 0
    assert trim[4].n_kept == trim[4].n_tokens  # nothing trimmed

    fp = D.simhash_fingerprints(degenerate_docs).collect()
    assert len(fp) == 5 and all(r.simhash is not None for r in fp)

    # exact dedup: NULL texts group under a NULL hash, distinct from ''
    groups = {r.content_hash: r for r in D.exact_dedup_groups(degenerate_docs).collect()}
    assert None in groups and groups[None].canonical_doc_id == 0
