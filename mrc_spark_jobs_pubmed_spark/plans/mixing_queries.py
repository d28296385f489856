"""Dataset-mixing queries: weighted source mixing, exact stratified
splits, and model-based quality scoring over `documents`.

These are the composition stage of a training-data pipeline — after
filtering and dedup, a corpus build decides HOW MUCH of each source to
train on (mixture weights, possibly > 1 epoch), carves reproducible
train/val/test splits, and applies a learned quality scorer. The
reference corpus stops at keyword extraction
(spark-pubmed-word-count/word_count.py:61-65); this is [ext] surface in
the spirit of published corpus builds (Gopher/Dolma-style source
weighting, C4-style held-out splits).

Scale notes (100 TB):
- mixing is a per-row expression + `explode(sequence(...))` — zero
  shuffle; upsampled copies are generated where the data lives, never
  collected. A weight table with thousands of sources would become a
  broadcast-joined dim instead of a literal CASE, same plan shape.
- the stratified split is ONE window shuffle on the stratum key —
  identical shape to any per-group ranking; at scale the stratum
  cardinality (sources × langs) is millions of rows per partition at
  most, and a skewed mega-source is exactly the AQE skew-split case.
- quality scoring is pure per-row arithmetic — fully codegen'd, no
  Python, no shuffle; a real model upgrade swaps the literal weights
  for a broadcast coefficient vector (linear) or an Arrow-batched
  pandas_udf (non-linear) without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators.dedup import tokens_col, tokens_sql
from mrc_spark_jobs_pubmed_spark.plans.registry import register
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

# --- weighted source mixing ------------------------------------------------

# Mixture weights per source: epochs-per-doc, fractional part applied by
# deterministic hash (no RNG — stable across runs, engines, executors,
# and re-partitioning). Sources not listed train at weight 1.0; weight
# 0.0 drops the source entirely.
MIX_WEIGHTS: dict[str, float] = {
    "src0": 2.5,  # high-quality source: 2 full epochs + 50% of a third
    "src1": 0.25,  # noisy source: keep a quarter
    "src2": 0.0,  # blocked source: drop
    "src3": 1.5,
}


def _frac_hex(frac: float) -> str:
    """Fractional keep-rate -> 8-hex-char md5-prefix threshold."""
    return format(int(frac * (1 << 32)), "08x")


def _n_copies_case_sql() -> str:
    """Shared Spark-SQL/DuckDB CASE expression for copies-per-doc.

    md5('mix:' || doc_id) is the per-doc uniform draw (salted so it is
    independent of the sampling/split hashes); floor(weight) full copies
    plus one more when the draw falls under the fractional threshold.
    """
    arms = []
    for src, w in sorted(MIX_WEIGHTS.items()):
        base, frac = int(w), w - int(w)
        expr = str(base)
        if frac > 0:
            expr = (
                f"{base} + (CASE WHEN substr(md5(concat('mix:', "
                f"CAST(doc_id AS STRING))), 1, 8) < '{_frac_hex(frac)}' "
                f"THEN 1 ELSE 0 END)"
            )
        arms.append(f"WHEN '{src}' THEN {expr}")
    return f"(CASE source {' '.join(arms)} ELSE 1 END)"


@register(
    "corpus_mix_weighted",
    oracle=f"""
SELECT doc_id, source, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS epoch_copy
FROM (
  SELECT doc_id, source, {_n_copies_case_sql()} AS n_copies
  FROM documents
)
WHERE n_copies > 0
""",
    doc="Weighted dataset mixing: per-source mixture weights applied as "
    "deterministic-hash epochs (floor(w) full copies + hash-gated "
    "fractional copy). Zero shuffle — copies are generated in place "
    "with explode(sequence(...)), never collected or re-sampled; the "
    "standard Gopher/Dolma-style source-weighting idiom at scale.",
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", "source", F.expr(_n_copies_case_sql()).alias("n_copies"))
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_i"),
        )
        .select("doc_id", "source", F.col("copy_i").cast("long").alias("epoch_copy"))
    )


# --- exact stratified train/val/test split ---------------------------------

# 80/10/10 by integer arithmetic (r*10 <= n*8 etc.) so both engines cut
# at identical rows — no float boundary, no ceil()-dialect drift.


@register(
    "corpus_split_stratified",
    oracle="""
SELECT doc_id, source,
       CASE WHEN r * 10 <= n * 8 THEN 'train'
            WHEN r * 10 <= n * 9 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY substr(md5(concat('split:', CAST(doc_id AS STRING))), 1, 8),
                                     doc_id) AS r,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
""",
    doc="Exact stratified train/val/test split: rank docs inside each "
    "source by a salted doc-id hash, cut at 80/10/10 with integer "
    "arithmetic. One window shuffle on the stratum key; proportions "
    "are exact per stratum (not just in expectation), reproducible "
    "across runs and engines, and new docs only ever shift ranks "
    "within their own stratum.",
)
def corpus_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    h = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8)
    w = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w.orderBy(h.asc(), F.col("doc_id").asc())).alias("r"),
        F.count("*").over(w).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "source",
        F.when(F.col("r") * 10 <= F.col("n") * 8, "train")
        .when(F.col("r") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
        .alias("split"),
    )


# --- fixed-weight quality classifier ---------------------------------------

# Logistic scorer over cheap per-doc features — the plumbing for
# fastText/KenLM-style model-based quality filtering (the learned
# weights here are illustrative constants; a trained model drops in as
# a broadcast coefficient vector with the same plan shape).
_QC_STOPWORDS = ("the", "of", "and", "a", "in", "to", "is")
_QC_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _QC_STOPWORDS) + "]"
_QC_STOP_SPARK = "array(" + ", ".join(f"'{w}'" for w in _QC_STOPWORDS) + ")"


@register(
    "corpus_quality_classifier",
    oracle=f"""
SELECT doc_id, n_tok, stop_ratio, digit_ratio, mean_tok_len, score,
       score >= 0.5 AS keep
FROM (
  SELECT doc_id, n_tok, stop_ratio, digit_ratio, mean_tok_len,
         round(1 / (1 + exp(-(-2.0 + 6.0 * stop_ratio - 8.0 * digit_ratio
                              + 0.5 * ln(1 + n_tok)
                              - 0.3 * abs(mean_tok_len - 4.5)))), 6) AS score
  FROM (
    SELECT doc_id,
           len(toks) AS n_tok,
           len(list_filter(toks, t -> list_contains({_QC_STOP_SQL}, t)))::DOUBLE
             / len(toks) AS stop_ratio,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
             / length(text) AS digit_ratio,
           list_sum(list_transform(toks, t -> length(t)))::DOUBLE
             / len(toks) AS mean_tok_len
    FROM (SELECT doc_id, text, {tokens_sql('text')} AS toks FROM documents)
    WHERE len(toks) > 0
  )
)
""",
    doc="Model-based quality scoring: logistic score over per-doc "
    "features (stopword ratio, digit ratio, token-length shape, "
    "log-length). Pure codegen'd per-row arithmetic — zero shuffle, "
    "no Python; the keep flag gates the corpus at a score threshold "
    "exactly like a fastText quality classifier would at scale.",
)
def corpus_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = tokens_col(F.col("text"))
    feats = docs.select(
        "doc_id",
        "text",
        toks.alias("toks"),
    ).where(F.size("toks") > 0)
    feats = feats.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tok"),
        (
            F.expr(f"size(filter(toks, t -> array_contains({_QC_STOP_SPARK}, t)))").cast(
                "double"
            )
            / F.size("toks")
        ).alias("stop_ratio"),
        (
            F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
            / F.length("text")
        ).alias("digit_ratio"),
        (
            F.expr("aggregate(toks, 0, (acc, t) -> acc + length(t))").cast("double")
            / F.size("toks")
        ).alias("mean_tok_len"),
    )
    z = (
        F.lit(-2.0)
        + F.lit(6.0) * F.col("stop_ratio")
        - F.lit(8.0) * F.col("digit_ratio")
        + F.lit(0.5) * F.log(F.lit(1) + F.col("n_tok"))
        - F.lit(0.3) * F.abs(F.col("mean_tok_len") - F.lit(4.5))
    )
    scored = feats.withColumn("score", F.round(F.lit(1) / (F.lit(1) + F.exp(-z)), 6))
    return scored.withColumn("keep", F.col("score") >= 0.5)


# --- temperature-scaled language sampling (mT5 alpha-mixing) ----------------

MIX_ALPHA = 0.3  # mT5's alpha: p_l ∝ share_l^alpha


@register(
    "corpus_mix_temperature",
    oracle=f"""
WITH stats AS (
  SELECT lang, count(*) AS n_docs, sum(n_chars) AS n_chars
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(n_chars) AS total_chars, sum(n_docs) AS total_docs FROM stats),
scaled AS (
  SELECT lang, n_docs, n_chars,
         n_chars::DOUBLE / total_chars AS share,
         pow(n_chars::DOUBLE / total_chars, {MIX_ALPHA}) AS p_raw,
         total_docs
  FROM stats CROSS JOIN tot
)
SELECT lang, n_docs, CAST(n_chars AS BIGINT) AS n_chars,
       round(share, 6) AS share,
       round(p_raw / sum(p_raw) OVER (), 6) AS p_temp,
       round(p_raw / sum(p_raw) OVER () / share, 6) AS epochs,
       CAST(round(p_raw / sum(p_raw) OVER () * total_docs, 0) AS BIGINT) AS docs_per_epoch
FROM scaled
""",
    doc="Temperature-scaled language sampling (the mT5/XLM-R alpha "
    "formula, alpha=0.3): per-language sampling probability p_l ∝ "
    "share_l^alpha computed FROM the corpus' own size statistics — "
    "char-weighted shares, the boost each low-resource language gets "
    "(epochs = p/share > 1), and the expected per-epoch doc budget. "
    "Complements corpus_mix_weighted (static config weights applied "
    "per doc): this is the upstream step that DERIVES the weights. "
    "Scale shape: one map-side-partial hash-agg on lang, then two "
    "1-row/|langs|-row broadcasts — the corpus is scanned once and "
    "only (lang, count, chars) partials ever ship.",
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = stats.agg(
        F.sum("n_chars").alias("total_chars"), F.sum("n_docs").alias("total_docs")
    )
    scaled = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n_chars").cast("double") / F.col("total_chars"))
        .withColumn("p_raw", F.pow("share", F.lit(MIX_ALPHA)))
    )
    wall = Window.partitionBy()
    p_temp = F.col("p_raw") / F.sum("p_raw").over(wall)
    return scaled.select(
        "lang",
        "n_docs",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round("share", 6).alias("share"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / F.col("share"), 6).alias("epochs"),
        F.round(p_temp * F.col("total_docs"), 0).cast("long").alias("docs_per_epoch"),
    )


# --- curriculum ordering ------------------------------------------------------

CURR_STAGES = 4  # easy -> hard training stages


@register(
    "corpus_curriculum_order",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE round(206.835
                   - 1.015 * (len(regexp_extract_all(text, '\\S+'))::DOUBLE
                              / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
                   - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
                             / greatest(len(regexp_extract_all(text, '\\S+')), 1)), 4)
         END AS flesch
  FROM documents
),
staged AS (
  SELECT doc_id, flesch,
         ntile({CURR_STAGES}) OVER (ORDER BY flesch DESC, doc_id) AS stage
  FROM scored
)
SELECT doc_id, flesch, CAST(stage AS BIGINT) AS stage,
       CAST(row_number() OVER (
              PARTITION BY stage
              ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id)
            AS BIGINT) AS stage_rank
FROM staged
""",
    doc="Curriculum data ordering: docs bucket into 4 training stages by "
    "readability (easiest = highest Flesch first — the canonical "
    "easy-to-hard curriculum), and WITHIN each stage the feed order is "
    "a deterministic md5 shuffle (sequential difficulty, shuffled "
    "content — ordered-by-source batches destabilize training). "
    "Scale: ntile needs a total order — at fixture scale one global "
    "sort; at 100 TB the stage boundary comes from approx_percentile "
    "cutpoints (the rel_approx_percentile machinery) with the same "
    "downstream shape — and the within-stage rank partitions by stage, "
    "reusing hash-shuffle state of stage-sized slices.",
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mrc_spark_jobs_pubmed_spark.plans.analysis_queries import ta_readability

    scored = ta_readability(spark, sf_dir).select("doc_id", "flesch")
    w_all = Window.orderBy(F.desc("flesch"), F.asc("doc_id"))
    staged = scored.select(
        "doc_id",
        "flesch",
        F.ntile(CURR_STAGES).over(w_all).cast("long").alias("stage"),
    )
    w_stage = Window.partitionBy("stage").orderBy(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), F.asc("doc_id")
    )
    return staged.select(
        "doc_id",
        "flesch",
        "stage",
        F.row_number().over(w_stage).cast("long").alias("stage_rank"),
    )


# --- length-debiased sampling -------------------------------------------------

LEN_TARGET = 1000  # chars: docs at/below keep with p=1, longer with p ~ 1/len


def _length_sample_oracle() -> str:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _hex2long

    h = _hex2long("md5(CAST(doc_id AS VARCHAR))", 1)
    return f"""
WITH scored AS (
  SELECT doc_id, n_chars,
         least(1.0, {LEN_TARGET}.0 / greatest(n_chars, 1)) AS p,
         ({h} % 1000000) / 1000000.0 AS u
  FROM documents
)
SELECT doc_id, n_chars, round(p, 6) AS p,
       round(1.0 / p, 6) AS weight
FROM scored
WHERE u < p
"""


@register(
    "corpus_length_sample",
    oracle=_length_sample_oracle(),
    doc="Length-debiased sampling: docs longer than the target keep "
    "with probability proportional to 1/length and carry the inverse-"
    "probability weight — the importance sampler that stops long "
    "documents dominating token counts while keeping the estimator "
    "unbiased. The accept/reject draw is a deterministic md5 of the "
    "doc id (no RNG state, stable under re-partitioning and re-runs — "
    "the same contract as corpus_sample_hash). Zero shuffle.",
)
def corpus_length_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _hex2long

    docs = load_table(spark, "documents", sf_dir)
    u = (
        F.expr(_hex2long("md5(CAST(doc_id AS STRING))", 1)) % 1000000
    ) / 1000000.0
    p = F.least(F.lit(1.0), F.lit(float(LEN_TARGET)) / F.greatest("n_chars", F.lit(1)))
    return (
        docs.select("doc_id", "n_chars", p.alias("p"), u.alias("u"))
        .where(F.col("u") < F.col("p"))
        .select(
            "doc_id",
            "n_chars",
            F.round("p", 6).alias("p"),
            F.round(F.lit(1.0) / F.col("p"), 6).alias("weight"),
        )
    )


# --- DSIR importance weights (hashed n-gram importance resampling) ----------

DSIR_BUCKETS = 64  # hashed feature space (paper uses 10k; domain here is tiny)
DSIR_KEEP_FRAC = 4  # keep top 1/4 by importance weight


def _dsir_bucket_sql() -> str:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _hex2long

    return f"{_hex2long('md5(tok)', 1)} % {DSIR_BUCKETS}"


@register(
    "corpus_dsir_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.tok AS tok
  FROM (SELECT doc_id, {tokens_sql('text')} AS toklist FROM documents),
       unnest(toklist) AS t(tok)
),
feat AS (
  SELECT doc_id, CAST({_dsir_bucket_sql()} AS BIGINT) AS bucket,
         count(*) AS n
  FROM toks GROUP BY 1, 2
),
tgt AS (
  SELECT f.bucket, CAST(sum(f.n) AS BIGINT) AS t_n
  FROM feat f JOIN documents d USING (doc_id)
  WHERE d.lang = 'en' GROUP BY f.bucket
),
raw AS (
  SELECT bucket, CAST(sum(n) AS BIGINT) AS r_n FROM feat GROUP BY bucket
),
delta AS (
  SELECT r.bucket,
         CAST(round((ln((coalesce(t.t_n, 0) + 1.0)
                        / ((SELECT sum(t_n) FROM tgt) + {DSIR_BUCKETS}.0))
                     - ln((r.r_n + 1.0)
                          / ((SELECT sum(r_n) FROM raw) + {DSIR_BUCKETS}.0)))
                    * 1000000) AS BIGINT) AS d_u6
  FROM raw r LEFT JOIN tgt t USING (bucket)
),
docw AS (
  SELECT f.doc_id,
         CAST(sum(f.n) AS BIGINT) AS n_tok,
         CAST(sum(f.n * dl.d_u6) AS BIGINT) AS logw_u6
  FROM feat f JOIN delta dl USING (bucket)
  GROUP BY f.doc_id
),
scored AS (
  SELECT d.doc_id, d.lang,
         coalesce(w.n_tok, 0) AS n_tok,
         coalesce(w.logw_u6, 0) AS logw_u6
  FROM documents d LEFT JOIN docw w USING (doc_id)
)
SELECT doc_id, lang, n_tok, logw_u6,
       row_number() OVER (ORDER BY logw_u6 DESC, doc_id)
         <= (SELECT count(*) FROM documents) // {DSIR_KEEP_FRAC}
         AS selected
FROM scored
""",
    doc="DSIR importance weights (Xie et al. 2023, 'Data Selection for "
    "LMs via Importance Resampling'): hashed-unigram bag models of the "
    "target distribution (here: English docs) and the raw corpus, "
    "add-1 smoothed over a {b}-bucket md5 feature space; each doc's "
    "log importance weight is sum(count_b * (ln p_tgt(b) - ln "
    "p_raw(b))), and the top 1/{k} by weight are marked selected. "
    "Exactness: per-BUCKET log-ratio deltas are rounded once to 1e-6 "
    "units (ln of a ratio of exact integers — one libm call per "
    "distinct bucket, the corpus_unigram_logprob discipline), then "
    "per-doc weights are exact integer dot products — no per-doc float "
    "accumulation, so ranking ties are impossible to flip across "
    "engines. Scale shape: feature extraction is a (doc, bucket) "
    "hash-agg with map-side partials bounded at {b} rows/doc; the "
    "bucket stat tables are {b} rows and broadcast into the per-doc "
    "dot product; the final selection window is a global rank over "
    "doc-count rows — at 100 TB that becomes a threshold join "
    "(quantile of logw_u6) instead of row_number, same output "
    "contract.".format(b=DSIR_BUCKETS, k=DSIR_KEEP_FRAC),
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    feat = (
        toks.select(
            "doc_id",
            F.expr(_dsir_bucket_sql()).cast("long").alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )
    tgt = (
        feat.join(docs.where(F.col("lang") == "en").select("doc_id"), "doc_id")
        .groupBy("bucket")
        .agg(F.sum("n").cast("long").alias("t_n"))
    )
    raw = feat.groupBy("bucket").agg(F.sum("n").cast("long").alias("r_n"))
    t_tot = tgt.agg(F.sum("t_n").alias("t_tot"))
    r_tot = raw.agg(F.sum("r_n").alias("r_tot"))
    delta = (
        raw.join(tgt, ["bucket"], "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce("t_n", F.lit(0)) + F.lit(1.0))
                        / (F.col("t_tot") + F.lit(float(DSIR_BUCKETS)))
                    )
                    - F.log(
                        (F.col("r_n") + F.lit(1.0))
                        / (F.col("r_tot") + F.lit(float(DSIR_BUCKETS)))
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("d_u6"),
        )
    )
    docw = (
        feat.join(F.broadcast(delta), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tok"),
            F.sum(F.col("n") * F.col("d_u6")).cast("long").alias("logw_u6"),
        )
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        docs.select("doc_id", "lang")
        .join(docw, ["doc_id"], "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("logw_u6", F.lit(0)).cast("long").alias("logw_u6"),
        )
    )
    w = Window.orderBy(F.desc("logw_u6"), F.asc("doc_id"))
    return scored.crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "lang",
        "n_tok",
        "logw_u6",
        (
            F.row_number().over(w)
            <= F.expr(f"n_docs div {DSIR_KEEP_FRAC}")
        ).alias("selected"),
    )


# --- multi-epoch allocation under a token budget -----------------------------

EPOCH_BUDGET_X = 2  # train-token budget as a multiple of unique tokens
EPOCH_CAP = 4  # max useful epochs per source (data-constrained scaling)


@register(
    "corpus_epoch_allocation",
    oracle=f"""
WITH src AS (
  SELECT source,
         CAST(sum(len({tokens_sql('text')})) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM src),
weighted AS (
  SELECT source, tokens,
         CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS s,
         total
  FROM src CROSS JOIN tot
),
alloc AS (
  SELECT source, tokens,
         CAST(s * 1000000 // sum(s) OVER () AS BIGINT) AS share_u6,
         CAST(({EPOCH_BUDGET_X} * total * s) // sum(s) OVER () AS BIGINT)
           AS target_tokens
  FROM weighted
)
SELECT source, tokens, share_u6, target_tokens,
       CAST(least({EPOCH_CAP}, (target_tokens + tokens - 1) // tokens)
            AS BIGINT) AS epochs,
       CAST(least(target_tokens, {EPOCH_CAP} * tokens) AS BIGINT)
         AS allocated_tokens,
       CAST(greatest(least(target_tokens, {EPOCH_CAP} * tokens) - tokens, 0)
            AS BIGINT) AS repeated_tokens
FROM alloc
ORDER BY source
""",
    doc="Multi-epoch token allocation under a fixed training budget (the "
    "data-constrained-scaling recipe: when the budget exceeds unique "
    f"data, REPEAT the best sources up to ~{EPOCH_CAP} epochs before "
    "returns decay). Per source: unique token count, a sqrt-weighted "
    "target share (integer isqrt — the alpha=0.5 temperature flatten "
    "without float pow), the budget slice, the epoch count "
    "ceil(target/tokens) capped at "
    f"{EPOCH_CAP}, and how many tokens are repeats. ALL integer "
    "arithmetic: shares in 1e-6 units by integer division, ceil by "
    "(a+b-1)//b — no float path to diverge between engines (floor(sqrt) "
    "of a BIGINT is the one double touch; IEEE sqrt is correctly "
    "rounded, so both engines floor the same value). Scale shape: one "
    "tokenize+count hash-agg to |sources| rows, then window math on "
    "that tiny table; the corpus ships only (source, count) partials. "
    "Downstream, corpus_curriculum_order / corpus_mix_weighted consume "
    "the epochs column as their repeat plan.",
)
def corpus_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    src = docs.groupBy("source").agg(
        F.sum(F.size(tokens_col(F.col("text")))).cast("long").alias("tokens")
    )
    tot = src.agg(F.sum("tokens").cast("long").alias("total"))
    weighted = src.crossJoin(F.broadcast(tot)).withColumn(
        "s", F.expr("CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT)")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    alloc = weighted.select(
        "source",
        "tokens",
        F.expr(f"s * 1000000").alias("_s6"),
        (F.lit(EPOCH_BUDGET_X) * F.col("total") * F.col("s")).alias("_bt"),
        F.sum("s").over(wall).alias("_ssum"),
    ).select(
        "source",
        "tokens",
        F.expr("CAST(_s6 div _ssum AS BIGINT)").alias("share_u6"),
        F.expr("CAST(_bt div _ssum AS BIGINT)").alias("target_tokens"),
    )
    return alloc.select(
        "source",
        "tokens",
        "share_u6",
        "target_tokens",
        F.expr(
            f"CAST(least({EPOCH_CAP}, (target_tokens + tokens - 1) div tokens) AS BIGINT)"
        ).alias("epochs"),
        F.expr(
            f"CAST(least(target_tokens, {EPOCH_CAP} * tokens) AS BIGINT)"
        ).alias("allocated_tokens"),
        F.expr(
            f"CAST(greatest(least(target_tokens, {EPOCH_CAP} * tokens) - tokens, 0) AS BIGINT)"
        ).alias("repeated_tokens"),
    ).orderBy("source")
