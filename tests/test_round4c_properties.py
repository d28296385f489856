"""Self-consistency invariants for the round-4c operators — the
structural identities the DuckDB differential can't state directly
(exact reconciliation, cross-query equalities, conservation laws) plus
the partitioning-invariance determinism contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark import plans
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _df(spark, name):
    return plans.get(name).fn(spark, SF)


def _rows(spark, name):
    return {tuple(r) for r in _df(spark, name).collect()}


def test_partitioning_invariance_round4c(spark):
    """Bit-identical rows under a radically different shuffle layout —
    the determinism contract every integer-arithmetic operator of this
    round claims."""
    names = [
        "rel_ewma_smoothing",
        "rel_bitmap_distinct",
        "rel_budget_allocation",
        "graph_weighted_sssp",
        "graph_modularity",
        "text_textrank_keywords",
        "rel_waterfall_bridge",
        "rel_fifo_matching",
        "graph_bom_explosion",
    ]
    base = {n: _rows(spark, n) for n in names}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n in names:
            assert _rows(spark, n) == base[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_budget_allocation_reconciles_exactly(spark):
    """Largest-remainder shares must sum to EXACTLY the budget — the
    property the method exists for."""
    from mrc_spark_jobs_pubmed_spark.plans.extra_queries import ALLOC_BUDGET

    rows = _df(spark, "rel_budget_allocation").collect()
    assert sum(r.alloc_bp for r in rows) == ALLOC_BUDGET
    assert sum(r.extra for r in rows) == ALLOC_BUDGET - sum(
        r.base_alloc for r in rows
    )


def test_bitmap_distinct_equals_count_distinct(spark):
    """The bitmap popcount is an EXACT distinct — must equal
    COUNT(DISTINCT user_id) per day, not approximate it."""
    got = {
        r.day: r.n_users_bitmap
        for r in _df(spark, "rel_bitmap_distinct").collect()
    }
    ev = load_table(spark, "events", SF)
    want = {
        r.day: r.n
        for r in ev.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_waterfall_bridge_decomposition_reconciles(spark):
    """volume_effect + price_effect == delta for every segment — exact,
    by the residual construction."""
    rows = _df(spark, "rel_waterfall_bridge").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.volume_effect_cents + r.price_effect_cents == r.delta_cents
        assert r.delta_cents == r.cents_new - r.cents_old


def test_fifo_matching_conservation(spark):
    """Matched pairs = sum over users of min(views, purchases): FIFO
    1:1 matching can neither create nor drop pairs."""
    ev = load_table(spark, "events", SF)
    per_user = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
        )
        .select(F.least("v", "p").alias("m"))
        .agg(F.sum("m").alias("t"))
        .collect()[0]
    )
    got = _df(spark, "rel_fifo_matching").collect()[0]
    assert got.n_matched == per_user.t
    assert got.n_matched <= min(got.n_views, got.n_purchases)


def test_modularity_members_match_lpa(spark):
    """graph_modularity and graph_label_propagation must agree on the
    community partition (same sizes for the communities both report) —
    they share one LPA core by construction."""
    mod = {
        r.community: r.n_members for r in _df(spark, "graph_modularity").collect()
    }
    lpa = {
        r.community: r.n_members
        for r in _df(spark, "graph_label_propagation").collect()
    }
    assert mod and all(lpa.get(c) == n for c, n in mod.items())


def test_asof_nearest_is_closer_than_other_side(spark):
    """The chosen side must actually be the nearer one, and prior/next
    must bracket the click."""
    rows = _df(spark, "rel_asof_nearest").collect()
    assert len(rows) > 0
    for r in rows:
        if r.prior_us is not None:
            assert r.prior_us <= r.t_us
        if r.next_us is not None:
            assert r.next_us > r.t_us
        if r.prior_us is not None and r.next_us is not None:
            d_prior = r.t_us - r.prior_us
            d_next = r.next_us - r.t_us
            if r.direction == "prior":
                assert d_prior <= d_next
            else:
                assert d_next < d_prior


def test_phash_pairs_within_threshold_and_symmetric_free(spark):
    """Every reported pair respects the hamming gate and appears once
    (a < b) — no symmetric duplicates from the two-band union."""
    from mrc_spark_jobs_pubmed_spark.plans.mm_queries import PHASH_MAX_HAM

    rows = _df(spark, "mm_phash_neardup").collect()
    seen = set()
    for r in rows:
        assert r.media_a < r.media_b
        assert 0 <= r.hamming <= PHASH_MAX_HAM
        assert (r.media_a, r.media_b) not in seen
        seen.add((r.media_a, r.media_b))
