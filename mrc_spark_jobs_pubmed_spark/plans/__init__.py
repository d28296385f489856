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
    mixing_queries,
    mm_queries,
    relational_queries,
    similarity_queries,
    streaming_queries,
    text_queries,
    tpch_more_queries,
)

# The round driver writes official CORRECTNESS rows for only the first
# ~50 entries of queries(), in order. Curate that window so every query
# family (SURVEY.md §2) has official rows: the r01-unchecked families
# (text/sim/stream/TPC-H batch 2) in full, the four r01-red rows
# (now fixed), the flagship, and the headline bench queries. Everything
# else stays registered (full surface) and is covered by the identical
# local harness (scripts/driver_check.py, tests/test_oracle.py).
DRIVER_WINDOW: list[str] = [
    # flagship + text family (r01: no official rows)
    "text_word_topk",
    "text_keywords_v2",
    "text_token_stats",
    "text_tfidf_top_terms",
    "text_inverted_index",
    "text_keyword_pairs",
    # similarity family (r01: no official rows)
    "sim_cosine_topk",
    "sim_ann_bucketed",
    "sim_ann_recall",
    "sim_neardup_top_pairs",
    "sim_lsh_bucket_stats",
    "sim_brp_lsh_buckets",
    # streaming family (r01: no official rows)
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "stream_session_windows",
    "stream_dedup_counts",
    "stream_interval_join",
    "stream_static_enrich",
    # TPC-H batch 2 (r01: no official rows)
    "rel_q4_order_priority",
    "rel_q6_forecast_revenue",
    "rel_q10_returned_items",
    "rel_q12_priority_class",
    "rel_q14_promo_revenue",
    "rel_q15_top_supplier",
    "rel_q16_supplier_variety",
    "rel_q18_big_orders",
    "rel_q19_disjunctive",
    "rel_q22_idle_customers",
    # round-2 additions: dataset mixing, semantic dedup, k-means IVF,
    # cross-corpus fuzzy join, random projection (new `emb` family)
    "corpus_mix_weighted",
    "sim_semdedup",
    "sim_kmeans_ivf",
    "dedup_lsh_join",
    "emb_random_projection",
    # r01 driver-red rows, fixed this round — must show green
    "rel_collect_set",
    "rel_salted_agg",
    "mm_decode_features",
    "corpus_pack_greedy",
    # headline bench queries + one representative per remaining family
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_region_revenue",
    "rel_window_running_total",
    "rel_asof_join",
    "dedup_minhash_bands",
    "dedup_jaccard_top_pairs",
    "ta_quality",
    "llm_corpus_prep",
    "corpus_repetition",
    "src_pubmed_pages",
    "udf_pandas_scalar",
    "udtf_split_words",
]

set_priority(DRIVER_WINDOW)
