"""Named-query registry — the engine's declared, oracle-checked surface.

Importing this package registers every query module. `all_queries()` /
`all_oracles()` feed the driver contract in `__spark_entry__.py`.
"""

from mrc_spark_jobs_pubmed_spark.plans.registry import (  # noqa: F401
    Query,
    all_oracles,
    all_queries,
    get,
    register,
    set_priority,
)

# Register all query modules (import side effects).
from mrc_spark_jobs_pubmed_spark.plans import (  # noqa: F401,E402
    analysis_queries,
    composite_queries,
    corpus_queries,
    dedup_queries,
    extra_queries,
    graph_queries,
    mixing_queries,
    mm_queries,
    relational_queries,
    similarity_queries,
    streaming_queries,
    text_queries,
    timeseries_queries,
    tpch_more_queries,
)

# The round driver writes official CORRECTNESS rows for only the first
# ~50 entries of queries(), in order. Rotate that window each round so
# every registered query eventually carries an official row. Round 4:
# the four r3 hash-fail rows lead (fixed this round — must prove green
# in an official file), then ALL 46 queries that have never appeared in
# any official CORRECTNESS file (r01 ∪ r02 ∪ r03). That is exactly the
# 50-row window; after r4 every registered query will have at least one
# official row. Everything else stays registered (full surface) and is
# covered by the identical local harness (scripts/driver_check.py,
# tests/test_oracle.py).
DRIVER_WINDOW: list[str] = [
    # r3 official hash-fails, root-caused + fixed this round (integer
    # div init for pagerank, exact-u4 revenue for the salted join,
    # printable-ASCII BPE alphabet, epoch-seconds rollup window) —
    # must show green
    "text_bpe_merges",
    "rel_skew_salted_join",
    "graph_pagerank",
    "stream_chained_rollup",
    # the full never-official set (46) — every remaining query that has
    # no row in CORRECTNESS r01/r02/r03
    "corpus_augment_dropout",
    "corpus_bigram_logprob",
    "corpus_cdc_chunks",
    "corpus_curriculum_order",
    "corpus_filter_funnel",
    "corpus_length_sample",
    "corpus_mix_temperature",
    "corpus_ngram_novelty",
    "corpus_soft_dedup_weights",
    "corpus_span_trim",
    "dedup_containment_pairs",
    "dedup_fuzzy_keep_best",
    "dedup_keep_best",
    "dedup_minhash_recall",
    "emb_int8_quantize",
    "emb_outlier_detection",
    "emb_pca_power",
    "emb_pq_codes",
    "graph_triangle_count",
    "mm_shard_manifest",
    "rel_asof_tolerance",
    "rel_cohort_retention",
    "rel_data_quality",
    "rel_event_pattern",
    "rel_fuzzy_linkage",
    "rel_histogram",
    "rel_q11_important_parts",
    "rel_q20_excess_supply",
    "rel_q21_waiting_suppliers",
    "rel_q2_min_cost_supplier",
    "rel_scd2_history",
    "rel_touch_attribution",
    "sim_binary_rerank",
    "sim_ivf_pq_search",
    "sim_ivfpq_recall",
    "sim_knn_join",
    "stream_interval_left_join",
    "stream_topk_per_window",
    "ta_char_entropy",
    "ta_readability",
    "ta_winnow_fingerprint",
    "ta_zipf_fit",
    "text_bpe_encode",
    "text_hashing_vectorizer",
    "text_pmi_collocations",
    "text_rake_keywords",
    # round-4 additions (beyond the 50-row window if the driver cuts at
    # 50 — next in line for the r5 rotation otherwise)
    "stream_stateful_sessions",
    "graph_bfs_levels",
    "sim_mips_topk",
    "emb_matryoshka_recall",
    "corpus_rag_chunks",
    "rel_gap_fill_interpolate",
    "rel_ts_anomaly_mad",
    "rel_time_weighted_avg",
    "rel_concurrency_sweep",
    "rel_ts_downsample_m4",
    "rel_markov_transitions",
    "dedup_simhash_stats",
    "stream_cdc_apply",
    "corpus_dsir_weights",
    "ta_tokenizer_fertility",
    "graph_label_propagation",
    "rel_multitouch_attribution",
    "corpus_k_anonymity",
    "rel_ts_correlation",
    "rel_new_users_daily",
    "rel_rfm_segmentation",
    "graph_kcore",
    "ta_langid_confusion",
    "emb_label_centroid_drift",
    "graph_link_prediction",
    "rel_histogram_equidepth",
    "rel_heartbeat_gaps",
    "ta_code_detection",
    "sim_ivf_nprobe_recall",
    "dedup_sorted_neighborhood",
    "mm_binary_dedup",
    "rel_out_of_order_metrics",
    "rel_scd2_point_in_time",
    "rel_funnel_latency",
    "emb_cluster_purity",
    "dedup_cluster_stats",
    "corpus_vocab_coverage",
    "emb_knn_label_eval",
    "rel_active_users_rolling",
    "rel_revenue_pareto",
    "rel_basket_lift",
    "graph_degree_distribution",
    "dedup_jaccard_histogram",
    "rel_ab_test_eval",
    "rel_ts_seasonal_profile",
    "corpus_datacard_by_source",
    "rel_cohort_ltv",
    "dedup_banding_tradeoff",
    "graph_hierarchy_depth",
    # round-4c additions (same next-in-line policy)
    "rel_ewma_smoothing",
    "rel_bitmap_distinct",
    "rel_item_item_cf",
    "rel_budget_allocation",
    "graph_weighted_sssp",
    "graph_modularity",
    "text_textrank_keywords",
    "mm_phash_neardup",
    "emb_dim_variance",
    "corpus_prefix_dup",
    "rel_gaps_islands",
    "graph_assortativity",
    "dedup_minhash_estimate",
    "sim_range_search",
    "rel_join_skew_profile",
    "corpus_snapshot_diff",
    "rel_path_analysis",
]

set_priority(DRIVER_WINDOW)
