"""Physical-plan regression tests (SURVEY.md §4): the optimizations the
engine's scale story depends on must be visible in the executed plan —
filter/column pushdown to parquet, broadcast joins for dimensions, and
top-k via TakeOrderedAndProject instead of a global sort."""

from __future__ import annotations

from mrc_spark_jobs_pubmed_spark import plans

SF = "/root/testdata/sf0.01"


def _physical(spark, name: str) -> str:
    df = plans.get(name).fn(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _n_shuffles(plan: str) -> int:
    """Algorithmic shuffle count: Exchange nodes minus the scan fan-out.

    The corpus tables repartition round-robin right after the scan
    (sources/catalog.fan_out — layout-independence plumbing for
    single-row-group files, a no-op on wide inputs), so a
    RoundRobinPartitioning exchange is NOT a data-movement decision of
    the query plan and is excluded from shuffle budgets."""
    import re

    nodes = len(re.findall(r"\(\d+\) Exchange\b", plan))
    fan_out = plan.count("Arguments: RoundRobinPartitioning")
    return nodes - fan_out


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _physical(spark, "rel_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 referenced columns — no full-width scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q3_broadcasts_dimensions(spark):
    plan = _physical(spark, "rel_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q5_star_join_is_all_broadcast(spark):
    plan = _physical(spark, "rel_q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark):
    plan = _physical(spark, "rel_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_cosine_topk_avoids_global_sort(spark):
    plan = _physical(spark, "sim_cosine_topk")
    assert "TakeOrderedAndProject" in plan


def test_int8_quantize_is_narrow_zero_shuffle(spark):
    plan = _physical(spark, "emb_int8_quantize")
    assert _n_shuffles(plan) == 0
    assert "Python" not in plan  # pure JVM arithmetic


def test_cosine_topk_query_vector_is_broadcast_not_collected(spark):
    """The query vector must ride the plan (1-row broadcast join), not a
    driver-side .first() fetch — one Spark job, no scheduling barrier."""
    plan = _physical(spark, "sim_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan
    # the bucket equality becomes the join key → broadcast HASH join
    bucketed = _physical(spark, "sim_ann_bucketed")
    assert "BroadcastHashJoin" in bucketed


def test_q1_aggregate_is_partial_then_final(spark):
    # map-side combine: two HashAggregate nodes around the exchange
    plan = _physical(spark, "rel_q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_text_pipeline_has_no_python_udf(spark):
    # the whole text pipeline (incl. lemmatizer) stays JVM-side
    plan = _physical(spark, "text_word_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semi_and_anti_join_operators(spark):
    assert "LeftSemi" in _physical(spark, "rel_semi_join")
    assert "LeftAnti" in _physical(spark, "rel_anti_join")


def test_multimodal_stays_narrow(spark):
    # binary decode/frame-sample must not introduce a shuffle: one
    # Arrow crossing, zero Exchange
    for name in ("mm_decode_features", "mm_frame_sample", "mm_resize_meta"):
        plan = _physical(spark, name)
        assert _n_shuffles(plan) == 0, name
        # one Arrow-batched crossing: mapInPandas or mapInArrow (r11
        # moved resize_media to mapInArrow for offsets-level re-slicing)
        assert "MapInPandas" in plan or "MapInArrow" in plan, name


def test_text_analysis_is_narrow_jvm_only(spark):
    # per-doc text stats: no shuffle, no Python
    for name in ("ta_quality", "ta_langid", "ta_token_counts", "ta_fingerprint"):
        plan = _physical(spark, name)
        assert _n_shuffles(plan) == 0, name
        assert "EvalPython" not in plan, name


def test_q18_aggregates_before_join(spark):
    # the HAVING subquery must run as aggregate-then-join: one lineitem
    # agg whose tiny surviving key set broadcasts into the orders join —
    # never a re-aggregation after the join
    plan = _physical(spark, "rel_q18_big_orders")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count(") Scan parquet") == 3  # lineitem read once


def test_q16_exclusion_is_broadcast_anti_join(spark):
    plan = _physical(spark, "rel_q16_supplier_variety")
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_row_ops_are_shuffle_free(spark):
    # repetition / PII / sampling / chunking are per-row rewrites: the
    # whole plan must stay narrow (no Exchange) with a pruned scan
    for name in (
        "corpus_repetition",
        "corpus_pii_redact",
        "corpus_sample_hash",
        "corpus_chunk_tokens",
    ):
        plan = _physical(spark, name)
        assert _n_shuffles(plan) == 0, name
        assert "BatchEvalPython" not in plan, name


def test_corpus_packing_single_window_shuffle(spark):
    # packing = one hash exchange for the per-lang window; the final
    # (lang, seq_id) agg ships map-side partials only
    plan = _physical(spark, "corpus_pack_greedy")
    assert _n_shuffles(plan) <= 1
    assert "Window" in plan


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    # a filter on the dimension must prune the fact's partitions at
    # runtime (DPP) — the join-driven generalization of static pruning,
    # load-bearing when the fact is 100 TB partitioned by date
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(i, 2015 + i % 8, float(i)) for i in range(5000)], ["k", "year", "v"]
    )
    fact.write.partitionBy("year").parquet(str(tmp_path / "fact"))
    dim = spark.createDataFrame(
        [(y, "keep" if y == 2017 else "drop") for y in range(2015, 2023)],
        ["year", "flag"],
    )
    back = spark.read.parquet(str(tmp_path / "fact"))
    j = back.join(F.broadcast(dim.filter(F.col("flag") == "keep")), "year")
    plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
    assert "dynamicpruning" in plan.lower()


def test_runtime_bloom_filter_prunes_smj_probe_side(spark):
    # when neither side broadcasts, a selective build side must inject a
    # runtime bloom filter on the probe side so non-matching fact rows
    # die at the scan instead of crossing the shuffle (thresholds are
    # production-sized, so the test lowers them to fire at fixture scale)
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.read.parquet(SF + "/lineitem.parquet")
        sel = spark.read.parquet(SF + "/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = big.join(sel, big.l_orderkey == sel.o_orderkey)
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in plan.lower()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q4_exists_is_semi_join_with_pushed_dates(spark):
    # EXISTS must stay a semi join (no row duplication) and the date
    # range must reach the orders parquet scan
    plan = _physical(spark, "rel_q4_order_priority")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q7_broadcasts_all_dims_one_fact_join(spark):
    # four dimension broadcasts; orders x lineitem is the only join
    # allowed to be non-broadcast (at fixture scale it broadcasts too)
    plan = _physical(spark, "rel_q7_nation_volume")
    assert plan.count("BroadcastHashJoin") >= 4


def test_q10_topk_avoids_global_sort(spark):
    plan = _physical(spark, "rel_q10_returned_items")
    assert "TakeOrderedAndProject" in plan


def test_q13_counts_survive_outer_join(spark):
    # left outer join with the filter on the right side kept in the
    # join condition (not pushed below it, which would drop customers)
    plan = _physical(spark, "rel_q13_order_count_dist")
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 2


def test_q17_aggregates_before_join(spark):
    # the correlated-avg rewrite: per-part averages computed once over
    # the brand-filtered slice, then joined back. r10 broadcast-policy
    # sweep: the part-key slice and per-part averages are corpus-growing
    # sides, so they carry NO forced broadcast hint — the static plan
    # over the checkpointed (estimate-free) slice is SMJ with
    # isFinalPlan=false and AQE converts to broadcast at runtime where
    # the sides fit. Assert the EXECUTED (final AQE) plan: at test sf
    # the threshold join must have become a broadcast join, i.e.
    # lineitem did not shuffle for the final join.
    df = plans.get("rel_q17_small_qty_revenue").fn(spark, SF)
    df.collect()  # 1-row result; finalizes THIS df's AdaptiveSparkPlan
    final = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "isFinalPlan=true" in final
    # explainString after execution prints the final plan then the
    # initial (pre-AQE) one — judge only the final section
    final_section = final.split("Initial Plan")[0]
    assert "BroadcastHashJoin" in final_section
    assert "SortMergeJoin" not in final_section


def test_q19_disjunction_residuals_push_to_scans(spark):
    # the OR-of-ANDs must leave derivable single-table residues at both
    # scans (p_size upper bound on part, l_quantity bounds on lineitem)
    plan = _physical(spark, "rel_q19_disjunctive")
    assert "Or(" in plan  # disjunctive residue pushed into a scan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_and_scalar_broadcast(spark):
    plan = _physical(spark, "rel_q22_idle_customers")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bm25_topk_plan_shape(spark):
    """BM25: top-k must be TakeOrderedAndProject, and the tiny df/stats
    aggregates must broadcast to the postings."""
    plan = _physical(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_line_dedup_hot_lines_broadcast(spark):
    """Line dedup: the hot-line removal is a broadcast anti-join (the
    hot set is tiny by construction), never a shuffled join of the full
    line table against itself."""
    plan = _physical(spark, "corpus_line_dedup")
    assert "BroadcastExchange" in plan
    assert plan.count("CartesianProduct") == 0


def test_mixing_queries_stay_narrow(spark):
    # weighted mixing + quality scoring are per-row: zero Exchange, no
    # Python eval; the explode never forces a shuffle
    for name in ("corpus_mix_weighted", "corpus_quality_classifier",
                 "emb_random_projection"):
        plan = _physical(spark, name)
        assert _n_shuffles(plan) == 0, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_stratified_split_is_one_window_shuffle(spark):
    # exact stratified split: exactly one shuffle (the stratum window)
    plan = _physical(spark, "corpus_split_stratified")
    assert _n_shuffles(plan) == 1


def test_kmeans_broadcasts_centroids(spark):
    # every assignment join broadcasts the k-row centroid side; the
    # embeddings scan must never shuffle for assignment
    plan = _physical(spark, "sim_kmeans_ivf")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_and_lsh_join_avoid_cartesian(spark):
    # pairwise compares are bucket/band equi-joins, never all-pairs
    for name in ("sim_semdedup", "dedup_lsh_join"):
        plan = _physical(spark, name)
        assert "CartesianProduct" not in plan, name


def test_pq_adc_topk_plan_shape(spark):
    """ADC search: top-k never global-sorts; the code lookup joins are
    broadcast (the distance tables are KBs); no CartesianProduct."""
    plan = _physical(spark, "sim_pq_adc_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_doc_sim_pairs_plan_shape(spark):
    """Sparse all-pairs similarity: candidate pairs come from a word
    equi-join (never doc x doc cartesian), top-k via TakeOrdered."""
    plan = _physical(spark, "text_doc_sim_pairs")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_zorder_key_is_narrow_zero_shuffle(spark):
    plan = _physical(spark, "rel_zorder_layout")
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_salted_join_does_not_broadcast_fact_side(spark):
    """The salted join must remain an equi-join on (key, salt); the
    replicated dim side is small and may broadcast, but no cartesian."""
    plan = _physical(spark, "rel_skew_salted_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_iterations_are_equi_joins(spark):
    """Each PageRank iteration joins edges to ranks on the node key —
    no cartesian anywhere; the only nested-loop joins allowed are the
    1-row broadcast of the damping base."""
    plan = _physical(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_funnel_stages_share_user_key(spark):
    plan = _physical(spark, "rel_funnel_steps")
    assert "CartesianProduct" not in plan


def test_ivf_pq_search_plan_shape(spark):
    plan = _physical(spark, "sim_ivf_pq_search")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_containment_join_is_hashed_equi_join(spark):
    """Candidate generation must join on the 8-byte shingle hash —
    never a cartesian, never the raw shingle string."""
    plan = _physical(spark, "dedup_containment_pairs")
    assert "CartesianProduct" not in plan
    assert "xxhash64" in plan


def test_cdc_boundary_scan_is_narrow(spark):
    """Only the reuse agg may shuffle; the boundary scan and chunk
    explode stay on the document's partition."""
    plan = _physical(spark, "corpus_cdc_chunks")
    assert _n_shuffles(plan) <= 2
    assert "Python" not in plan


def test_bpe_encode_joins_vocab_broadcast(spark):
    plan = _physical(spark, "text_bpe_encode")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pca_iterations_are_broadcast_only(spark):
    """The d x d covariance materializes once (localCheckpoint → the
    iteration plan reads an ExistingRDD, proving the Arrow-batched
    build ran exactly once at build time); every power-iteration round
    is a 1-row vector broadcast — no cartesian, no shuffle of the
    covariance."""
    plan = _physical(spark, "emb_pca_power")
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_span_coverage_is_two_window_shuffles(spark):
    """Duplicate-span coverage: the cross-doc test is a min/max window
    over the gram hash (no count-distinct join back), coverage is a lag
    window on doc_id, and the per-doc totals join is the only join.
    Nothing cartesian, nothing Python, and only 3 physical exchanges
    (gram window, doc window — whose hash partitioning the per-doc agg
    reuses with no extra exchange — and the totals broadcast), each
    listed twice in the formatted string."""
    plan = _physical(spark, "dedup_span_coverage")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert _n_shuffles(plan) <= 3
    assert plan.count("Window") >= 2


def test_fuzzy_linkage_blocks_never_all_pairs(spark):
    """Candidate generation must be a hash equi-join on the wildcard
    blocking key — a cartesian over customers would be the classic
    entity-resolution scale killer."""
    plan = _physical(spark, "rel_fuzzy_linkage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan


def test_keep_best_is_one_window_shuffle(spark):
    """Canonical selection: row_number + count/sum windows must share
    one fingerprint exchange (listed twice in the formatted string) —
    a second exchange would mean the window specs diverged."""
    plan = _physical(spark, "dedup_keep_best")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert _n_shuffles(plan) <= 1


def test_readability_is_narrow_zero_shuffle(spark):
    plan = _physical(spark, "ta_readability")
    assert _n_shuffles(plan) == 0
    assert "Python" not in plan


def test_winnow_is_narrow_zero_shuffle(spark):
    """Winnowing is per-doc-local: the whole computation must run as
    row-local array expressions — zero exchanges, no per-doc window
    sort (the exploded-window form measured 27x DuckDB at sf1)."""
    plan = _physical(spark, "ta_winnow_fingerprint")
    assert _n_shuffles(plan) == 0
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert "Window" not in plan


def test_ngram_novelty_reference_broadcasts(spark):
    """The reference slice's distinct-gram set must reach the probe as
    a broadcast hash join at fixture scale — a shuffled join of the
    candidate grams would double the gram-volume shuffle."""
    plan = _physical(spark, "corpus_ngram_novelty")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_scd2_windows_share_user_exchange(spark):
    """SCD2: lag, lead, and row_number all partition by user_id — one
    exchange serves all three window operators."""
    plan = _physical(spark, "rel_scd2_history")
    assert plan.count("Exchange") <= 2
    assert "Python" not in plan


def test_triangle_count_edges_broadcast_no_smj(spark):
    """Triangle wedges close over the checkpointed edge set via
    broadcast joins; nothing cartesian, no sort-merge join, and the
    corpus subtree is not replicated into the three edge aliases
    (the checkpoint bounds the exchange count)."""
    plan = _physical(spark, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 16
    assert "TakeOrderedAndProject" in plan


def test_pmi_topk_avoids_global_sort(spark):
    """PMI: top-k must be TakeOrderedAndProject; probability lookups
    reach the bigram table as broadcast joins of the checkpointed
    unigram aggregate, never a sort-merge join."""
    plan = _physical(spark, "text_pmi_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_zipf_rank_cap_is_topk_not_global_sort(spark):
    """Zipf fit: the rank cap arrives via TakeOrderedAndProject; the
    only window runs over the capped 1000 rows."""
    plan = _physical(spark, "ta_zipf_fit")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_asof_tolerance_single_shuffle_like_asof(spark):
    """Tolerance variant must keep the as-of plan: one user_id exchange
    for the time-ordered window, no range join."""
    plan = _physical(spark, "rel_asof_tolerance")
    assert plan.count("Exchange") <= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shard_manifest_is_one_window_shuffle(spark):
    """Shard packing: the running-byte-offset window and the manifest
    agg share the lang exchange (shard_id is a function of lang +
    offset, so the grouping's clustering is satisfied)."""
    plan = _physical(spark, "mm_shard_manifest")
    assert _n_shuffles(plan) <= 1
    assert "Python" not in plan
    assert "Window" in plan


def test_rake_has_no_pergroup_collect_sort(spark):
    """RAKE: phrase strings come from slicing the doc token array at
    (min pos, count) — no collect_list/array_sort per phrase instance;
    word-score lookup is a broadcast join; top-k is
    TakeOrderedAndProject."""
    plan = _physical(spark, "text_rake_keywords")
    assert "TakeOrderedAndProject" in plan
    assert "collect_list" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_knn_join_is_bucket_grouped_pandas(spark):
    """kNN join: one exchange on the bucket key into the Arrow-batched
    per-bucket BLAS kernel — never a bucket self-join scoring pairs in
    the expression interpreter, never a cartesian."""
    plan = _physical(spark, "sim_knn_join")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_bitmap_distinct_two_shuffles_no_expand(spark):
    """rel_bitmap_distinct's whole point is the shuffle shape: one
    partial-aggregating exchange on (day, word) then one on day — never
    the id-list repartition a COUNT(DISTINCT) plans (no Expand node,
    which is how Spark rewrites distinct aggregates)."""
    plan = _physical(spark, "rel_bitmap_distinct")
    assert _n_shuffles(plan) == 2
    assert "Expand" not in plan
    assert "partial_bit_or" in plan or "bit_or" in plan


def test_item_item_cf_broadcasts_marginals(spark):
    """The part-frequency marginals are dimension-sized and must ride
    broadcasts into the pair table; only the items build and the pair
    agg (plus the rank window) may shuffle."""
    plan = _physical(spark, "rel_item_item_cf")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_prefix_dup_single_shuffle(spark):
    """Prefix-clone detection is one hash-agg on the 16-byte prefix key
    — any extra exchange means the zero-shuffle projection regressed."""
    plan = _physical(spark, "corpus_prefix_dup")
    assert _n_shuffles(plan) == 1


def test_textrank_collapses_before_iterating(spark):
    """TextRank must rank over the DISTINCT edge set, not the corpus:
    the corpus-sized explode feeds exactly one distinct, and the
    iteration joins run on the checkpointed edge RDD (visible as a
    scan-existing-RDD leaf, not a re-read of the parquet per round)."""
    plan = _physical(spark, "text_textrank_keywords")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Scan parquet") == 0  # iterations read the checkpoint
    assert "Scan ExistingRDD" in plan


def test_waterfall_bridge_pushes_date_filter(spark):
    """The two-period scan must push its date range to parquet — a
    bridge over two years of a decade-deep orders table reads two
    years, not the table."""
    plan = _physical(spark, "rel_waterfall_bridge")
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan
    assert "BroadcastHashJoin" in plan


def test_interval_overlap_is_equi_join_not_cartesian(spark):
    """The binned interval join must plan as an equi-join on the
    composite (user, chunk) key — never a cartesian/BNL range join."""
    plan = _physical(spark, "rel_interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort


def test_rate_limit_single_user_shuffle(spark):
    """Rate-limit audit: one hash exchange on user_id for the window,
    then the per-type rollup — distinct-filtered agg adds its expand,
    but no join, no sort beyond the window."""
    plan = _physical(spark, "rel_rate_limit_audit")
    assert "Join" not in plan
    assert "hashpartitioning(user_id" in plan


def test_rolling_median_windows_on_rollup_not_raw(spark):
    """The median frame must run on the (type, day) rollup: the window
    sort key is the tiny aggregated domain, preceded by a partial agg."""
    plan = _physical(spark, "rel_rolling_median")
    assert "partial_sum" in plan.lower() or "partial" in plan.lower()
    assert "percentile" in plan.lower()


def test_bitmap_overlap_joins_words_not_users(spark):
    """Segment overlap joins word-bitmaps (8 B per 64 users), never raw
    id lists: the join key is word_id and totals broadcast back."""
    plan = _physical(spark, "rel_bitmap_segment_overlap")
    assert "bit_or" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # the two totals joins
    assert "CartesianProduct" not in plan


def test_zone_map_pruning_single_pass_no_join(spark):
    plan = _physical(spark, "rel_zone_map_pruning")
    assert "Join" not in plan
    assert "Union" in plan


def test_l_diversity_is_one_agg_no_join(spark):
    plan = _physical(spark, "rel_l_diversity")
    assert "Join" not in plan


def test_aes_sample_is_topk_no_window(spark):
    """A-ES sampling: TakeOrdered cuts to K rows before the rank
    window — the global window must not see the corpus."""
    plan = _physical(spark, "corpus_aes_weighted_sample")
    assert "TakeOrderedAndProject" in plan


def test_lindley_sharded_equals_narrow_and_broadcasts_carries(spark):
    """The (type, day)-sharded Lindley must reproduce the serial queue's
    readout exactly (prefix sum/min are associative — the chunk-carry
    identity), and the chunk-domain carry table must come back as a
    broadcast join, not a shuffle."""
    narrow = plans.get("rel_queue_wait_lindley").fn(spark, SF)
    sharded = plans.get("rel_queue_wait_lindley_sharded").fn(spark, SF)
    assert sorted(map(tuple, narrow.collect())) == sorted(map(tuple, sharded.collect()))
    plan = _physical(spark, "rel_queue_wait_lindley_sharded")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_r6_batch_plan_shapes(spark):
    """Round-6 batch: no cartesians anywhere; the specific shape claims
    each docstring makes are pinned here (counts are from the formatted
    explain, which lists each node twice — tree + details)."""
    # interval coalescing: one user_id partitioning serves both windows
    # and both aggs — no join, no cartesian
    p = _physical(spark, "rel_interval_coalesce")
    assert "CartesianProduct" not in p and "Join" not in p
    assert p.count("Exchange") <= 4  # <=2 real, all hashpartitioning(user_id)
    assert "hashpartitioning(user_id" in p

    # decayed engagement: no window at all — scalar broadcast + hash-agg
    # + TakeOrdered (the 1-row max-ts broadcast is the only BNLJ)
    p = _physical(spark, "rel_decayed_engagement")
    assert "TakeOrderedAndProject" in p
    assert p.count("Window") == 0
    assert "CartesianProduct" not in p

    # percent_rank/cume_dist: exactly one real exchange (the window key)
    p = _physical(spark, "rel_window_distribution")
    assert p.count("Exchange") <= 2 and "Window" in p

    # weighted median: distributed selection — broadcast joins for the
    # totals/target-bucket, never a corpus-sized flag-keyed window
    p = _physical(spark, "rel_weighted_median")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p

    # mode: value domain collapses before the ranking window; the
    # distinct-count joins back as a broadcast
    p = _physical(spark, "rel_mode_stats")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p

    # gini / packing efficiency: one key shuffle (+ the tiny ordered
    # output's range partitioning), map-side partials
    for name in ("corpus_source_gini", "corpus_packing_efficiency"):
        p = _physical(spark, name)
        assert "CartesianProduct" not in p and "Join" not in p
        assert p.count("Exchange") <= 6

    # bigram entropy: the (source, bigram) agg ships partial counts —
    # raw exploded bigrams never cross an exchange
    p = _physical(spark, "ta_bigram_entropy")
    assert "partial_count" in p or "partial" in p.lower()
    assert "CartesianProduct" not in p


def test_interval_coalesce_sharded_equals_narrow(spark):
    """(user, day)-sharded island merge must reproduce the single-window
    sweep exactly — prefix-max and flag prefix-sum are associative, the
    chunk carries stitch them back (the Lindley-sharded recipe)."""
    narrow = plans.get("rel_interval_coalesce").fn(spark, SF)
    sharded = plans.get("rel_interval_coalesce_sharded").fn(spark, SF)
    assert sorted(map(tuple, narrow.collect())) == sorted(map(tuple, sharded.collect()))
    plan = _physical(spark, "rel_interval_coalesce_sharded")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_interval_coalesce_sharded_hot_user(spark, tmp_path):
    """Skew contract for the range-sharded island merge: one user owns
    90% of the corpus (so their rows span MANY range partitions) and
    carries an island across shard boundaries — including later events
    wholly absorbed by a carried interval (the all-absorbed-chunk edge).
    sharded == narrow must hold exactly."""
    import datetime
    import os

    T0 = datetime.datetime(2024, 1, 1)
    rows = []
    # hot user 1: an opening mega-interval (value 5000 -> 500k s of
    # service) that absorbs everything for ~6 days, then sparse islands
    rows.append((0, T0, 1, "view", 5000.0, "{}"))
    for i in range(1, 9000):
        # every 60 s; first ~8300 events fall inside the mega-interval
        rows.append((i, T0 + datetime.timedelta(seconds=60 * i), 1, "view", 0.001, "{}"))
    # cold users 2..200: a few disjoint events each
    eid = 10000
    for u in range(2, 201):
        for j in range(5):
            rows.append(
                (eid, T0 + datetime.timedelta(days=j, seconds=u), u, "view", 0.5, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path / "hot_sf")
    df.coalesce(4).write.parquet(os.path.join(sf_dir, "events.parquet"))

    narrow = plans.get("rel_interval_coalesce").fn(spark, sf_dir)
    sharded = plans.get("rel_interval_coalesce_sharded").fn(spark, sf_dir)
    n = sorted(map(tuple, narrow.collect()))
    s = sorted(map(tuple, sharded.collect()))
    assert n == s and len(n) == 200
    # the hot user genuinely crossed shards: with 9000 of ~10000 rows on
    # one key and 32 range partitions, their rows cannot fit one pid
    hot = [r for r in n if r[0] == 1][0]
    assert hot[1] >= 2  # mega-interval island + at least one later island


def test_r7_new_ops_plan_shapes(spark):
    """Round-7 additions: dedup growth = one hash-keyed window + tiny
    batch rollups (no self-join, no cartesian); budget mixture = one
    tokenize pass to the source domain, totals joined as a 1-row
    broadcast, no corpus-sized second exchange."""
    p = _physical(spark, "corpus_dedup_growth")
    assert "Window" in p and "CartesianProduct" not in p
    assert "SortMergeJoin" not in p  # first-occurrence via window, not self-join

    p = _physical(spark, "corpus_budget_mixture")
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p  # 1-row total


def test_r7b_silhouette_and_vocab_growth_plan_shapes(spark):
    """Session additions: silhouette = centroid table broadcast into a
    codegen explode->partial-agg chain (no window, no cartesian, no
    sort-merge); vocab growth = ONE corpus pass (a single Expand node
    carries both grouping sets; a second Expand would mean the tokenize
    lineage runs twice)."""
    p = _physical(spark, "emb_silhouette")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p
    assert "Window" not in p

    # vocab growth eager-checkpoints the 10-row curve, so the EMITTED
    # plan must read only the checkpoint: zero parquet scans — the OLS
    # stitch + final select can never re-execute the tokenize lineage.
    # The one-corpus-pass claim (single Expand carrying both grouping
    # sets) is asserted on the pre-checkpoint subtree via the module's
    # own builders.
    p = _physical(spark, "ta_vocab_growth")
    assert "parquet" not in p.lower()
    assert "ExistingRDD" in p or "Scan ExistingRDD" in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p

    from pyspark.sql import functions as F

    from mrc_spark_jobs_pubmed_spark.operators.dedup import tokens_col
    from mrc_spark_jobs_pubmed_spark.plans.analysis_queries import (
        HEAPS_BUCKETS,
    )
    from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", SF)
    bounds = docs.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    d = docs.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(HEAPS_BUCKETS - 1),
            F.expr(f"((doc_id - lo) * {HEAPS_BUCKETS}) div (hi - lo + 1)"),
        ).alias("bucket"),
        tokens_col(F.col("text")).alias("toks"),
    )
    g = (
        d.select("bucket", F.explode("toks").alias("w"))
        .groupingSets([["bucket"], ["w"]], "bucket", "w")
        .agg(F.count("*").alias("n"))
    )
    sub = g._sc._jvm.PythonSQLUtils.explainString(
        g._jdf.queryExecution(), "formatted"
    )
    import re

    assert len(re.findall(r"\(\d+\) Expand\b", sub)) == 1
    assert sub.count("documents") <= 2  # one scan node (tree + details)
