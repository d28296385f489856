"""Self-consistency invariants for the round-4b time-series/event
operators — properties the DuckDB differential can't express directly:
partitioning invariance (the determinism contract under a different
shuffle layout) and structural identities between related outputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark import plans
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return {tuple(r) for r in plans.get(name).fn(spark, SF).collect()}


def test_partitioning_invariance(spark):
    """The integer-contract queries must produce bit-identical rows
    under a radically different shuffle layout — the property that
    makes results diffable across cluster sizes at 100 TB."""
    names = [
        "rel_time_weighted_avg",
        "rel_concurrency_sweep",
        "rel_markov_transitions",
        "rel_ts_correlation",
        "rel_new_users_daily",
    ]
    base = {n: _rows(spark, n) for n in names}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n in names:
            assert _rows(spark, n) == base[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_m4_buckets_cover_all_points(spark):
    """M4 per-bucket counts must partition the event set exactly, and
    every bucket's first/last values must sit within [min, max]."""
    ev_n = load_table(spark, "events", SF).count()
    df = plans.get("rel_ts_downsample_m4").fn(spark, SF)
    agg = df.agg(F.sum("n_points").alias("s")).collect()[0]
    assert agg.s == ev_n
    bad = df.where(
        (F.col("v_first_u4") < F.col("v_min_u4"))
        | (F.col("v_first_u4") > F.col("v_max_u4"))
        | (F.col("v_last_u4") < F.col("v_min_u4"))
        | (F.col("v_last_u4") > F.col("v_max_u4"))
        | (F.col("t_first_us") > F.col("t_last_us"))
    ).count()
    assert bad == 0


def test_markov_probabilities_normalize(spark):
    """Transition counts must sum to the per-source total, and the
    integer probabilities to <= 1e6 per source (truncating division
    loses at most |dst| micro-units)."""
    df = plans.get("rel_markov_transitions").fn(spark, SF)
    rows = df.collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        n_src = rs[0].n_src
        assert sum(r.n_trans for r in rs) == n_src, src
        p_sum = sum(r.p_u6 for r in rs)
        assert 1_000_000 - len(rs) <= p_sum <= 1_000_000, src


def test_multitouch_values_reconcile(spark):
    """Linear attribution must conserve value: per-channel attributed
    micro-units sum exactly to total purchase value — the property the
    integer remainder-to-first-touch split exists for."""
    ev = load_table(spark, "events", SF)
    total = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("t"))
        .collect()[0]
        .t
    )
    df = plans.get("rel_multitouch_attribution").fn(spark, SF)
    attributed = df.agg(F.sum("attributed_u4").alias("s")).collect()[0].s
    assert attributed == total


def test_concurrency_peak_bounds(spark):
    """The sweep-line peak is at least 1 and no more than the interval
    count; the peak instant carries the per-type maximum."""
    for r in plans.get("rel_concurrency_sweep").fn(spark, SF).collect():
        assert 1 <= r.peak_concurrency <= r.n_intervals


def test_simhash_spanning_edges_preserve_clusters(spark):
    """r5 contract: dedup_simhash_hamming emits SPANNING edges (star
    within identical fingerprints + one edge per near-dup signature
    pair), not the clone-quadratic full enumeration. The guarantees
    that replace the old aggregate-consistency check:

    1. every spanning edge appears in the full enumeration (subset),
    2. union-find over spanning edges and over the full enumeration
       produce IDENTICAL clusters (same node set, same partition),
    3. the edge count is linear: (docs - distinct_sigs) + sig_pairs.
    """
    from mrc_spark_jobs_pubmed_spark.operators import dedup as D
    from mrc_spark_jobs_pubmed_spark.plans.dedup_queries import (
        _simhash_banded_pairs,
    )
    from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

    spanning = [
        (r.doc_a, r.doc_b)
        for r in plans.get("dedup_simhash_hamming").fn(spark, SF).collect()
    ]
    sig = D.simhash_fingerprints(load_table(spark, "documents", SF))
    full = [
        (r.doc_a, r.doc_b) for r in _simhash_banded_pairs(sig).collect()
    ]
    assert set(spanning) <= set(full)
    assert len(spanning) < len(full) or len(spanning) == len(full)

    def clusters(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out: dict[int, set] = {}
        for n in parent:
            out.setdefault(find(n), set()).add(n)
        return {frozenset(v) for v in out.values()}

    assert clusters(spanning) == clusters(full)

    rows = sig.groupBy("simhash").count().collect()
    n_docs = sum(r["count"] for r in rows)
    n_sigs = len(rows)
    n_sig_pairs = len(
        {
            (min(a, b), max(a, b))
            for (a, b), h in (
                ((p.doc_a, p.doc_b), p.hamming)
                for p in plans.get("dedup_simhash_hamming").fn(spark, SF).collect()
            )
            if h > 0
        }
    )
    assert len(spanning) == (n_docs - n_sigs) + n_sig_pairs
