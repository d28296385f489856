"""Operator-level invariants for the round-3 additions (SURVEY.md §5):
properties that must hold regardless of fixture content, checked on
sf0.001 — complementing the value-exact oracle gate with structural
guarantees a refactor could silently break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark import plans
from mrc_spark_jobs_pubmed_spark.plans.corpus_queries import cdc_chunk_rows
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return plans.get(name).fn(spark, SF)


def test_zorder_key_is_invertible(spark):
    """De-interleaving the Morton key must recover both coordinates for
    every row — the property file-skipping correctness rests on."""
    out = _q(spark, "rel_zorder_layout")
    orders = load_table(spark, "orders", SF).select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("xk"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            % 65536
        ).alias("yk"),
    )
    xs = " + ".join(f"((zkey div {1 << (2 * i)}) % 2) * {1 << i}" for i in range(16))
    ys = " + ".join(
        f"((zkey div {1 << (2 * i + 1)}) % 2) * {1 << i}" for i in range(16)
    )
    dec = out.select(
        "o_orderkey", F.expr(xs).alias("dx"), F.expr(ys).alias("dy")
    )
    bad = (
        dec.join(orders, "o_orderkey")
        .filter((F.col("dx") != F.col("xk")) | (F.col("dy") != F.col("yk")))
        .count()
    )
    assert bad == 0


def test_funnel_stages_are_monotone(spark):
    row = _q(spark, "rel_funnel_steps").first()
    assert row.n_view >= row.n_click >= row.n_purchase > 0
    assert 0.0 <= row.click_to_purchase <= 1.0
    assert 0.0 <= row.view_to_click <= 1.0


def test_merge_upsert_action_counts(spark):
    docs = load_table(spark, "documents", SF)
    n = docs.count()
    n_upd = docs.filter(F.col("doc_id") % 7 == 0).count()
    n_ins = docs.filter(F.col("doc_id") % 13 == 0).count()
    got = {
        r.action: r.cnt
        for r in _q(spark, "corpus_merge_upsert")
        .groupBy("action")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got.get("update", 0) == n_upd
    assert got.get("insert", 0) == n_ins
    assert got.get("keep", 0) == n - n_upd


def test_pagerank_ranks_positive_and_typed(spark):
    rows = _q(spark, "graph_pagerank").collect()
    assert len(rows) == 20
    for r in rows:
        assert r.rank_p12 > 0
        assert r.node_type == ("supplier" if r.node >= 10_000_000 else "customer")


def test_cdc_chunks_reassemble_to_original(spark):
    """Concatenating every doc's chunks in boundary order must rebuild
    the document exactly — chunking loses nothing."""
    docs = load_table(spark, "documents", SF)
    rebuilt = (
        cdc_chunk_rows(docs)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "chunk_text"))),
                    lambda z: z["chunk_text"],
                ),
                "",
            ).alias("rebuilt")
        )
    )
    bad = (
        rebuilt.join(docs, "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_bpe_encode_symbol_bounds(spark):
    """Each token is >= 1 symbol; merging can only shrink the symbol
    count, bounded below by the token count and above by char count."""
    docs = load_table(spark, "documents", SF)
    enc = _q(spark, "text_bpe_encode")
    chars = docs.select(
        "doc_id",
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_chars"),
    )
    bad = (
        enc.join(chars, "doc_id")
        .filter(
            (F.col("n_bpe_symbols") < F.col("n_tokens"))
            | (F.col("n_bpe_symbols") > F.col("n_chars"))
        )
        .count()
    )
    assert bad == 0


def test_doc_sim_pairs_are_ordered_unit_cosines(spark):
    rows = _q(spark, "text_doc_sim_pairs").collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0.0 < r.cosine <= 1.0


def test_histogram_partitions_the_table(spark):
    n_orders = load_table(spark, "orders", SF).count()
    agg = _q(spark, "rel_histogram").agg(F.sum("n").alias("t")).first()
    assert agg.t == n_orders


def test_event_pattern_counts_nest(spark):
    bad = (
        _q(spark, "rel_event_pattern")
        .filter(
            (F.col("n_vcp") > F.col("n_vc")) | (F.col("n_vc") * 2 > F.col("n_events"))
        )
        .count()
    )
    assert bad == 0


def test_pca_vector_is_unit_norm(spark):
    rows = _q(spark, "emb_pca_power").collect()
    assert len(rows) == 64
    norm2 = sum(r.pc1 * r.pc1 for r in rows)
    assert abs(norm2 - 1.0) < 1e-3  # 6dp rounding of 64 components


def test_pq_adc_is_sorted_nonnegative(spark):
    rows = _q(spark, "sim_pq_adc_topk").collect()
    assert len(rows) == 10
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)
    assert len({r.vec_id for r in rows}) == 10


def test_salted_join_matches_plain_join(spark):
    """The salted rewrite must be exactly semantics-preserving (this is
    also the oracle, but assert it engine-side so a salt-logic change
    fails fast in unit tests)."""
    li = load_table(spark, "lineitem", SF)
    supp = load_table(spark, "supplier", SF)
    plain = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("revenue_c4"),
            F.count("*").alias("n_lines"),
        )
    )
    got = {
        r.s_name: (r.revenue_c4, r.n_lines)
        for r in _q(spark, "rel_skew_salted_join").collect()
    }
    want = {r.s_name: (r.revenue_c4, r.n_lines) for r in plain.collect()}
    assert got == want
