"""Invariant tests for the corpus-prep operators (SURVEY.md §2 Part B
LLM-pipeline extensions): conservation and subset properties that must
hold for ANY corpus, complementing the value-exact oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark import plans
from mrc_spark_jobs_pubmed_spark.operators.dedup import tokens_col
from mrc_spark_jobs_pubmed_spark.plans.corpus_queries import CHUNK_TOKENS
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    return load_table(spark, "documents", SF).select(
        "doc_id", "lang", F.size(tokens_col(F.col("text"))).alias("n_tok")
    )


def test_chunking_conserves_tokens(spark):
    # per doc: chunk sizes sum to the token count, every chunk is full
    # except the last, and no chunk exceeds the budget
    chunks = plans.get("corpus_chunk_tokens").fn(spark, SF)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("total"),
        F.count("*").alias("n_chunks"),
        F.max("n_chunk_tokens").alias("max_chunk"),
        F.sum((F.col("n_chunk_tokens") < CHUNK_TOKENS).cast("int")).alias("n_partial"),
    )
    joined = per_doc.join(_doc_tokens(spark), "doc_id")
    assert joined.filter(F.col("total") != F.col("n_tok")).count() == 0
    assert joined.filter(F.col("max_chunk") > CHUNK_TOKENS).count() == 0
    assert joined.filter(F.col("n_partial") > 1).count() == 0


def test_packing_conserves_tokens_and_docs(spark):
    packed = plans.get("corpus_pack_greedy").fn(spark, SF)
    per_lang = packed.groupBy("lang").agg(
        F.sum("seq_tokens").alias("tok"), F.sum("n_docs").alias("docs")
    )
    truth = _doc_tokens(spark).groupBy("lang").agg(
        F.sum("n_tok").alias("tok"), F.count("*").alias("docs")
    )
    diff = per_lang.exceptAll(truth).count() + truth.exceptAll(per_lang).count()
    assert diff == 0


def test_hash_sampling_is_deterministic_subset(spark):
    sample = plans.get("corpus_sample_hash").fn(spark, SF)
    n_all = load_table(spark, "documents", SF).count()
    n = sample.count()
    # 26/256 ≈ 10.2% expected; binomial 5σ bounds at n_all=500
    assert 0.04 * n_all < n < 0.18 * n_all
    # determinism: same result on re-evaluation
    assert sample.exceptAll(plans.get("corpus_sample_hash").fn(spark, SF)).count() == 0


def test_shuffle_shards_form_a_permutation(spark):
    shards = plans.get("corpus_shuffle_shards").fn(spark, SF)
    n_all = load_table(spark, "documents", SF).count()
    assert shards.count() == n_all
    assert shards.select("doc_id").distinct().count() == n_all
    # pos is dense 1..count(shard) inside every shard
    per_shard = shards.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per_shard.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0


def test_incremental_dedup_keeps_only_unseen_new_docs(spark):
    kept = plans.get("corpus_incremental_dedup").fn(spark, SF)
    # kept ⊆ new batch
    assert kept.filter(F.col("doc_id") % 5 != 0).count() == 0
    # no kept fingerprint exists in the corpus side
    docs = load_table(spark, "documents", SF)
    corpus_fps = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    )
    assert kept.join(corpus_fps, "fp", "left_semi").count() == 0


def test_domain_cap_limits_every_source(spark):
    capped = plans.get("corpus_domain_cap").fn(spark, SF)
    from mrc_spark_jobs_pubmed_spark.plans.corpus_queries import DOMAIN_CAP

    per_src = capped.groupBy("source").agg(F.count("*").alias("n"))
    assert per_src.filter(F.col("n") > DOMAIN_CAP).count() == 0
    # every source with >= CAP docs is filled exactly to the cap
    totals = (
        load_table(spark, "documents", SF)
        .groupBy("source")
        .agg(F.count("*").alias("avail"))
    )
    short = per_src.join(totals, "source").filter(
        (F.col("avail") >= DOMAIN_CAP) & (F.col("n") < DOMAIN_CAP)
    )
    assert short.count() == 0
    # deterministic: re-evaluation yields the identical kept set
    again = plans.get("corpus_domain_cap").fn(spark, SF)
    assert capped.exceptAll(again).count() == 0


def test_contamination_flags_eval_overlap_only(spark):
    from mrc_spark_jobs_pubmed_spark.plans.corpus_queries import EVAL_MOD

    flagged = plans.get("corpus_contamination").fn(spark, SF)
    # no eval doc may appear, hits never exceed total grams
    assert flagged.filter(F.col("doc_id") % EVAL_MOD == 0).count() == 0
    assert flagged.filter(F.col("n_hits") > F.col("n_grams")).count() == 0
    bad = flagged.filter(
        (F.col("contamination") <= 0) | (F.col("contamination") > 1)
    )
    assert bad.count() == 0


def test_contamination_probe_broadcasts_eval_side(spark):
    # the eval n-gram set must broadcast: the train side may shuffle only
    # for its per-doc aggregation, never for the overlap join
    df = plans.get("corpus_contamination").fn(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_stats_topk_avoids_global_sort(spark):
    df = plans.get("corpus_ngram_stats").fn(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan


def test_line_dedup_reassembles_and_drops(spark):
    """Invariants: with an impossible threshold nothing drops and docs
    reassemble verbatim; with threshold 0 every line shared by 2+ docs
    drops; counts are consistent."""
    from mrc_spark_jobs_pubmed_spark.operators.dedup import drop_common_lines

    rows = [
        (1, "a b c d e f"),   # lines (w=3): 'a b c', 'd e f'
        (2, "a b c x y z"),   # shares 'a b c' with doc 1
        (3, "p q r"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    keep_all = {
        r.doc_id: r
        for r in drop_common_lines(docs, max_docs_per_line=9, width=3).collect()
    }
    assert keep_all[1].text_kept == "a b c d e f"
    assert all(r.n_lines_dropped == 0 for r in keep_all.values())

    strict = {
        r.doc_id: r
        for r in drop_common_lines(docs, max_docs_per_line=1, width=3).collect()
    }
    assert strict[1].text_kept == "d e f"      # 'a b c' in 2 docs -> dropped
    assert strict[2].text_kept == "x y z"
    assert strict[3].text_kept == "p q r"
    assert strict[1].n_lines == 2 and strict[1].n_lines_dropped == 1


def test_packing_efficiency_all_zero_token_lang(spark, duck, tmp_path):
    """r6 ADVICE: a lang whose docs ALL tokenize to zero tokens used to
    diverge between engines — Spark `(c-1) div B` truncates -1 to 0
    (n_seqs=1) while DuckDB `//` floors to -1 (n_seqs=0, then a
    division by zero in fill_u6). The greatest(c-1, 0) guard on BOTH
    sides must pin the degenerate stream to n_seqs=1 / fill_u6=0."""
    import os

    rows = [
        (0, "", "zz", "webA", 0),
        (1, "   ", "zz", "webA", 3),
        (2, None, "zz", "webB", 0),
        (3, "alpha beta gamma", "en", "webA", 16),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "sf_degenerate")
    docs.coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    q = plans.get("corpus_packing_efficiency")
    got = {r["lang"]: r.asDict() for r in q.fn(spark, sf_dir).collect()}
    assert got["zz"]["n_seqs"] == 1 and got["zz"]["fill_u6"] == 0

    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = duck.execute(q.oracle).fetchdf().set_index("lang").to_dict("index")
    for lang in ("zz", "en"):
        for k in ("n_docs", "total_tokens", "n_seqs", "fill_u6", "n_split_docs"):
            assert int(got[lang][k]) == int(want[lang][k]), (lang, k)
