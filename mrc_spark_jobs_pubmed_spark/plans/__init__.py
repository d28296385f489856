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
    tpch_more_queries,
)

# The round driver writes official CORRECTNESS rows for only the first
# ~50 entries of queries(), in order. Rotate that window each round so
# every registered query eventually carries an official row. Round 3:
# the six events-ts casualties (fixed this round — must show green)
# lead, then the 25 queries that have never appeared in an official
# CORRECTNESS file (r01 ∪ r02), then sim_brp_lsh_buckets (upgraded from
# rows-only to a value-gated property check this round), then the
# flagship + headline bench queries for round-over-round continuity.
# Everything else stays registered (full surface) and is covered by the
# identical local harness (scripts/driver_check.py, tests/test_oracle.py).
DRIVER_WINDOW: list[str] = [
    # events-ts bug casualties, fixed this round — must show green
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "stream_session_windows",
    "stream_interval_join",
    "stream_static_enrich",
    "rel_asof_join",
    # never-official queries (not in CORRECTNESS r01/r02): round-2
    # additions first, then the relational/TPC-H long tail
    "corpus_line_dedup",
    "text_bm25_topk",
    "text_cms_heavy_hitters",
    "dedup_simhash_hamming",
    "corpus_unigram_logprob",
    "corpus_split_stratified",
    "corpus_quality_classifier",
    "rel_q7_nation_volume",
    "rel_q8_market_share",
    "rel_q9_product_profit",
    "rel_q13_order_count_dist",
    "rel_q17_small_qty_revenue",
    "rel_pivot",
    "rel_grouping_sets",
    "rel_agg_stats",
    "rel_approx_distinct",
    "rel_approx_percentile",
    "rel_semi_join",
    "rel_anti_join",
    "rel_set_ops",
    "rel_string_funcs",
    "rel_date_funcs",
    "rel_math_case",
    "rel_json_props",
    "rel_nested_struct",
    # upgraded from rows-only to value-gated this round
    "sim_brp_lsh_buckets",
    # round-3 additions (never-official by construction)
    "sim_pq_adc_topk",
    "text_doc_sim_pairs",
    "text_bpe_merges",
    "rel_funnel_steps",
    "rel_skew_salted_join",
    "rel_zorder_layout",
    "corpus_merge_upsert",
    "graph_pagerank",
    "stream_chained_rollup",
    # late round-3 addition (never-official by construction); its
    # sibling corpus_mix_temperature waits for the r4 rotation — the
    # window is capped at 50 and every current row is either a
    # must-prove (events-ts fixes) or never-official
    "dedup_span_coverage",
    # flagship + family representatives (continuity across rounds;
    # queries already green in BOTH r01 and r02 rotated out to make
    # room for the never-official set — corpus_pack_greedy rotated out
    # this round, green in r02 and family covered 5x above)
    "text_word_topk",
    "ta_quality",
    "llm_corpus_prep",
    "mm_decode_features",
    "src_pubmed_pages",
    "udf_pandas_scalar",
    "udtf_split_words",
    "emb_random_projection",
]

set_priority(DRIVER_WINDOW)
