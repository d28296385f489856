"""Corpus-preparation queries: the training-data pipeline surface beyond
dedup/similarity — repetition filters, PII redaction, deterministic
sampling, token chunking, and sequence packing over `documents`.

These are the operators a 100 TB LLM-corpus build runs after language-ID
and dedup (Gopher/C4-style filtering, fixed-budget packing for the
trainer). Every one is a narrow, per-row or single-shuffle plan:

- repetition / PII / sampling / chunking are pure per-row expressions —
  zero shuffle, fully codegen'd, trivially parallel at any scale;
- packing is one window shuffle on the partition key (`lang`), the same
  shape as any partitioned cumulative sum.

The reference's text stage stops at stopword filtering
(spark-pubmed-word-count/word_count.py:61-65); this module is the [ext]
surface BASELINE.json's north star adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators.dedup import (
    SHINGLE_K,
    SHINGLES_ARR_EXPR,
    shingles_sql,
    tokens_col,
    tokens_sql,
)
from mrc_spark_jobs_pubmed_spark.plans.registry import register
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

_TOKS_SQL = tokens_sql("text")

# --- Gopher-style repetition signals ---------------------------------------

# Thresholds in the spirit of Gopher's repetition filters (top-token
# fraction, duplicate n-gram fraction); exact values are corpus knobs.
TOP_TOKEN_MAX = 0.20
DUP_TRIGRAM_MAX = 0.30


@register(
    "corpus_repetition",
    oracle=f"""
SELECT doc_id,
       n_tokens,
       top_token_ratio,
       dup_trigram_ratio,
       (top_token_ratio <= {TOP_TOKEN_MAX} AND dup_trigram_ratio <= {DUP_TRIGRAM_MAX}) AS keep
FROM (
  SELECT doc_id,
         len(toks) AS n_tokens,
         list_max(list_transform(list_distinct(toks),
                  d -> len(list_filter(toks, t -> t = d))))::DOUBLE / len(toks)
           AS top_token_ratio,
         1.0 - len(list_distinct(sh))::DOUBLE / len(sh) AS dup_trigram_ratio
  FROM (
    SELECT doc_id, toks, {shingles_sql('toks')} AS sh
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
  )
  WHERE len(toks) >= {SHINGLE_K}
)
""",
    doc="Gopher-style repetition filter: top-token fraction and duplicate "
    "word-trigram fraction per doc, with the keep/drop verdict. Pure "
    "per-row array expressions — zero shuffle; the per-doc quadratic "
    "top-token scan is bounded by doc length (explode+window is the "
    "rewrite if docs grow unbounded).",
)
def corpus_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = tokens_col(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks")).where(
        F.size("toks") >= SHINGLE_K
    )
    t = F.col("toks")
    sh = F.expr(SHINGLES_ARR_EXPR)
    # top-token count as the longest run in the sorted array — one
    # O(n log n) sort + O(n) fold per doc, vs the O(distinct × n)
    # nested scan the oracle uses (value-identical; MEASURED sf0.1:
    # 0.28s vs 0.68s steady-state). The sentinel '' prev never matches
    # a real token: tokens_col drops empty strings.
    top_cnt = F.aggregate(
        F.sort_array(t),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    out = base.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        (top_cnt.cast("double") / F.size(t)).alias("top_token_ratio"),
        (F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh)).alias(
            "dup_trigram_ratio"
        ),
    )
    return out.withColumn(
        "keep",
        (F.col("top_token_ratio") <= TOP_TOKEN_MAX)
        & (F.col("dup_trigram_ratio") <= DUP_TRIGRAM_MAX),
    )


# --- PII redaction ---------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IDNUM_RE = r"\d{9,}"


@register(
    "corpus_pii_redact",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(aug, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(aug, '{IDNUM_RE}')) AS n_idnums,
       md5(regexp_replace(regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{IDNUM_RE}', '<ID>', 'g')) AS redacted_md5
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact_' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE text END AS aug
  FROM documents
)
""",
    doc="PII redaction: email and long-digit-run detection + replacement, "
    "value-checked by the md5 of the redacted text. A deterministic "
    "email is injected into every 10th doc so the operator provably "
    "fires (the fixture corpus contains no natural PII). Zero shuffle; "
    "both regexes are RE2/Java-compatible so Spark and the oracle run "
    "the identical patterns.",
)
def corpus_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    aug = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact_"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.col("text"))
    base = docs.select("doc_id", aug.alias("aug"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("aug"), EMAIL_RE, "<EMAIL>"), IDNUM_RE, "<ID>"
    )
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all("aug", F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("aug", F.lit(IDNUM_RE), 0)).alias("n_idnums"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --- deterministic hash sampling -------------------------------------------

# First two md5 hex chars < '1a' keeps 26/256 ≈ 10.2% of docs — stable
# across runs, engines, and cluster sizes (no RNG, no seed coordination).
SAMPLE_HEX_LT = "1a"


@register(
    "corpus_sample_hash",
    oracle=f"""
SELECT doc_id, lang, h2
FROM (
  SELECT doc_id, lang,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
  FROM documents
)
WHERE h2 < '{SAMPLE_HEX_LT}'
""",
    doc="Deterministic hash sampling: keep docs whose md5(doc_id) prefix "
    "falls under a hex threshold (~10%). The standard reproducible "
    "sampling idiom at scale — no RNG state, no seed coordination "
    "across executors, stable under re-partitioning and re-runs, and "
    "stratification is free (group the kept rows by any column).",
)
def corpus_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        docs.select("doc_id", "lang", h2.alias("h2"))
        .where(F.col("h2") < SAMPLE_HEX_LT)
    )


# --- fixed-size token chunking ---------------------------------------------

CHUNK_TOKENS = 64


@register(
    "corpus_chunk_tokens",
    oracle=f"""
SELECT doc_id, chunk_id,
       len(chunk) AS n_chunk_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM (
  SELECT doc_id, c AS chunk_id,
         list_slice(toks, c * {CHUNK_TOKENS} + 1, (c + 1) * {CHUNK_TOKENS}) AS chunk
  FROM (
    SELECT doc_id, toks,
           unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT))) AS c
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    WHERE len(toks) > 0
  )
)
""",
    doc="Fixed-size token chunking: each doc expands to ceil(n/64) "
    "64-token chunks (doc_id, chunk_id, token count, md5 of the chunk "
    "text) — the context-window splitter of a training pipeline. Row "
    "expansion via sequence+explode, a narrow op: no shuffle, chunk "
    "rows stay on their doc's partition.",
)
def corpus_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).where(F.size("toks") > 0)
    n_chunks = F.ceil(F.size("toks") / F.lit(float(CHUNK_TOKENS))).cast("long")
    exploded = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("toks"),
        (F.col("chunk_id") * CHUNK_TOKENS + 1).cast("int"),
        CHUNK_TOKENS,
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# --- greedy sequence packing -----------------------------------------------

PACK_BUDGET = 1024


@register(
    "corpus_pack_greedy",
    oracle=f"""
SELECT lang, seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM (
  SELECT lang, doc_id, n_tok,
         CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS seq_id
  FROM (
    SELECT lang, doc_id, n_tok,
           SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM (SELECT lang, doc_id, len({_TOKS_SQL}) AS n_tok FROM documents)
  )
)
GROUP BY lang, seq_id
""",
    doc="Sequence packing for training: concatenate docs in doc_id order "
    "per language stream and cut every 1024 tokens — each doc lands in "
    "the sequence its start offset falls into (the concat-and-split "
    "packing real LLM pipelines use). One window shuffle on the "
    "partition key (lang); packing streams are independent so the op "
    "parallelizes across them, never a global sort.",
)
def corpus_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "lang", "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq_id = F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(PACK_BUDGET))).cast(
        "long"
    )
    return (
        base.withColumn("seq_id", seq_id)
        .groupBy("lang", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --- deterministic corpus shuffle + sharding --------------------------------

N_SHARDS = 8


def _register_shuffle_shards() -> None:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _hex2long

    oracle = f"""
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
FROM (
  SELECT doc_id, h, {_hex2long('h', 1)} % {N_SHARDS} AS shard
  FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
)
"""

    @register(
        "corpus_shuffle_shards",
        oracle=oracle,
        doc="Deterministic corpus shuffle for training order: docs land in "
        "md5-derived shards and are ordered inside each shard by the "
        "hash — a reproducible global permutation with no RNG, the "
        "write-side layout a trainer streams shard-by-shard. One hash "
        "shuffle on the shard key; shards sort independently, so there "
        "is never a global sort.",
    )
    def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, "documents", sf_dir)
        h = F.md5(F.col("doc_id").cast("string"))
        base = docs.select(
            "doc_id",
            h.alias("h"),
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_SHARDS).alias(
                "shard"
            ),
        )
        w = Window.partitionBy("shard").orderBy("h", "doc_id")
        return base.select(
            "doc_id", "shard", F.row_number().over(w).alias("pos")
        )


_register_shuffle_shards()


# --- incremental dedup (new batch vs existing corpus) -----------------------


@register(
    "corpus_incremental_dedup",
    oracle="""
SELECT n.doc_id, n.fp
FROM (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents WHERE doc_id % 5 = 0
) n
ANTI JOIN (
  SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents WHERE doc_id % 5 <> 0
) c USING (fp)
""",
    doc="Incremental dedup: a new batch (doc_id % 5 = 0 stands in for "
    "today's crawl) anti-joined on normalized content fingerprint "
    "against the existing corpus — the daily-increment form of exact "
    "dedup, and the reference's skip-if-exists guard (A5, "
    "job_pubmed_submit.py:41-43) done declaratively. At 100 TB the "
    "corpus side is a fingerprint-only table (16 bytes/doc); the join "
    "shuffles on the hash, uniformly distributed by construction.",
)
def corpus_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    new = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", fp.alias("fp"))
    corpus = docs.filter(F.col("doc_id") % 5 != 0).select(fp.alias("fp")).distinct()
    return new.join(corpus, "fp", "left_anti").select("doc_id", "fp")


# --- benchmark decontamination ----------------------------------------------

CONTAM_K = 4  # n-gram size for eval-overlap matching
EVAL_MOD = 97  # doc_id % 97 == 0 stands in for the held-out eval set


def _kgrams_spark(k: int):
    """Word k-gram array from a column named `toks`, as chained zip_with
    over shifted slices — each zip_with argument evaluates once per row
    (an element_at-in-lambda form would re-evaluate the token split per
    element after CollapseProject inlining; see SHINGLES_ARR_EXPR)."""
    acc = "toks"
    for j in range(1, k):
        acc = (
            f"zip_with({acc}, slice(toks, {j + 1}, greatest(size(toks) - {j}, 0)), "
            f"(a, b) -> concat(a, ' ', b))"
        )
    return F.expr(f"filter({acc}, s -> s IS NOT NULL)")


def _kgrams_sql(toks_expr: str, k: int) -> str:
    parts = " || ' ' || ".join(f"{toks_expr}[i + {j}]" for j in range(1, k))
    return (
        f"list_filter(list_transform({toks_expr}, (x, i) -> "
        f"CASE WHEN i + {k - 1} <= len({toks_expr}) THEN x || ' ' || {parts} END), "
        f"s -> s IS NOT NULL)"
    )


@register(
    "corpus_contamination",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct({_kgrams_sql('toks', CONTAM_K)})) AS gram
  FROM toks
),
eval_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
train AS (
  SELECT doc_id, gram FROM grams WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT t.doc_id,
       count(*) AS n_grams,
       count(e.gram) AS n_hits,
       round(count(e.gram)::DOUBLE / count(*), 6) AS contamination
FROM train t LEFT JOIN eval_grams e USING (gram)
GROUP BY t.doc_id
HAVING count(e.gram) > 0
""",
    doc="Benchmark decontamination: train docs sharing word 4-grams with "
    "the held-out eval set (doc_id % 97 = 0 stands in), reported as "
    "per-doc hit count and contaminated fraction — the n-gram-overlap "
    "decontamination every LLM corpus build runs before training. The "
    "eval n-gram set is distinct-small by construction, so the overlap "
    "join broadcasts it and the train side never shuffles for the "
    "probe; the per-doc agg shuffles on doc_id only. At 100 TB the "
    "broadcast side stays the eval set (benchmarks are MBs), and the "
    "gram string would be hashed to 64-bit before the join to cut "
    "probe width.",
)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    grams = (
        docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(_kgrams_spark(CONTAM_K))).alias("gram"),
        )
    )
    eval_grams = (
        grams.where(F.col("doc_id") % EVAL_MOD == 0).select("gram").distinct()
    )
    train = grams.where(F.col("doc_id") % EVAL_MOD != 0)
    hit = F.broadcast(eval_grams.withColumn("is_hit", F.lit(1)))
    return (
        train.join(hit, "gram", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("is_hit").alias("n_hits"),
            F.round(F.count("is_hit").cast("double") / F.count("*"), 6).alias(
                "contamination"
            ),
        )
        .where(F.col("n_hits") > 0)
    )


# --- corpus n-gram statistics ----------------------------------------------

NGRAM_TOP_K = 25


@register(
    "corpus_ngram_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct({shingles_sql('toks')})) AS gram FROM toks
)
SELECT gram, count(*) AS doc_freq
FROM grams
GROUP BY gram
ORDER BY doc_freq DESC, gram
LIMIT {NGRAM_TOP_K}
""",
    doc="Corpus n-gram statistics: top-25 word trigrams by document "
    "frequency — the corpus-level frequency table behind quality "
    "filters and tokenizer audits. Per-doc distinct before explode "
    "keeps the shuffle to one row per (doc, gram); the count is "
    "partial+final map-side; top-k is TakeOrderedAndProject, never a "
    "global sort of the gram table.",
)
def corpus_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    grams = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).select("doc_id", F.explode(F.array_distinct(F.expr(SHINGLES_ARR_EXPR))).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(NGRAM_TOP_K)
    )


# --- per-domain quota sampling ----------------------------------------------

DOMAIN_CAP = 10


@register(
    "corpus_domain_cap",
    oracle=f"""
SELECT doc_id, source, pos
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
  FROM documents
)
WHERE pos <= {DOMAIN_CAP}
""",
    doc="Per-domain quota sampling: keep at most 10 docs per source, "
    "chosen by deterministic hash order — the per-domain cap a "
    "CommonCrawl-style pipeline applies so no single site dominates "
    "the corpus. One shuffle on source; the hash order makes the kept "
    "subset reproducible with no RNG. A pathologically hot domain is "
    "the window's skew case — the rewrite is a two-phase cap (cap per "
    "(source, salt) then re-cap per source), same shape as the salted "
    "aggregation in operators/skew.py.",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("pos"))
        .where(F.col("pos") <= DOMAIN_CAP)
    )


# --- CCNet-style line-level dedup -------------------------------------------

LINE_DEDUP_WIDTH = 3  # pseudo-line width; real corpora split on '\n' instead
LINE_DEDUP_MAX_DOCS = 2


def _register_line_dedup() -> None:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import (
        drop_common_lines,
        pseudo_lines_sql,
    )

    w, k = LINE_DEDUP_WIDTH, LINE_DEDUP_MAX_DOCS
    lines_sql = pseudo_lines_sql("text", w)

    @register(
        "corpus_line_dedup",
        oracle=f"""
WITH base AS (
  SELECT doc_id, {lines_sql} AS ls FROM documents
),
lines AS (
  SELECT doc_id, i AS pos, ls[i + 1] AS line
  FROM base, unnest(range(len(ls))) t(i)
),
hot AS (
  SELECT line
  FROM (SELECT line, count(DISTINCT doc_id) AS n FROM lines GROUP BY line)
  WHERE n > {k}
),
kept AS (
  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM hot)
),
per_doc AS (
  SELECT doc_id,
         string_agg(line, ' ' ORDER BY pos) AS text_kept,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       coalesce(p.text_kept, '') AS text_kept,
       len(b.ls) AS n_lines,
       CAST(len(b.ls) - coalesce(p.n_kept, 0) AS BIGINT) AS n_lines_dropped
FROM base b LEFT JOIN per_doc p USING (doc_id)
""",
        doc="CCNet-style line-level dedup: lines recurring in more than "
        f"{k} distinct docs (boilerplate) are dropped corpus-wide, docs "
        "reassembled in line order. Fixture corpus has no newlines, so "
        f"lines are deterministic {w}-word windows; real corpora swap the "
        "splitter for split(text, chr(10)) with the same plan. Scale "
        "shape: narrow line build, one hash-agg for frequencies, hot "
        "lines broadcast anti-join (tiny by construction), positional "
        "re-agg — no global sort anywhere.",
    )
    def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, "documents", sf_dir)
        return drop_common_lines(
            docs, max_docs_per_line=k, width=w
        )


_register_line_dedup()


# --- unigram-LM document scoring (perplexity proxy) ------------------------


@register(
    "corpus_unigram_logprob",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.tok AS tok
  FROM (SELECT doc_id, {_TOKS_SQL} AS toklist FROM documents),
       unnest(toklist) AS t(tok)
),
vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tot AS (SELECT sum(n) AS total FROM vocab)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       -- exact-int mean of per-token 1e-6-unit logprobs (p < 1 so
       -- -ln(p) >= 0): order-independent sum + integer half-up close
       -(((2 * sum(CAST(round(-ln(n::DOUBLE / total) * 1000000) AS BIGINT))
           + count(*)) // (2 * count(*)))) / 1000000.0 AS avg_logprob
FROM toks JOIN vocab USING (tok) CROSS JOIN tot
GROUP BY doc_id
""",
    doc="Unigram-LM document scoring (CCNet-style perplexity proxy): "
    "corpus token frequencies -> per-doc mean log-probability; "
    "out-of-distribution docs score low and gate the corpus. Two "
    "hash-agg shuffles (vocab build, per-doc mean) + one token->vocab "
    "join; at 100 TB the vocab is pruned to top-V with an OOV default "
    "and ships as a broadcast, making the join map-side.",
)
def corpus_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # same one-tokenize-pass / per-doc-count shape as
    # corpus_perplexity_buckets: the checkpointed (doc, tok, c) table
    # feeds both the vocab build and the scoring join, and the tok
    # shuffle ships counts, not the raw token stream
    doc_tok = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab = doc_tok.groupBy("tok").agg(F.sum("c").alias("n"))
    tot = vocab.agg(F.sum("n").alias("total"))
    return (
        doc_tok.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tok"),
            # exact-int mean of per-token 1e-6-unit logprobs (see oracle)
            F.sum(
                F.col("c")
                * F.round(
                    -F.log(F.col("n").cast("double") / F.col("total")) * 1e6
                ).cast("long")
            ).alias("_nl6"),
        )
        .select(
            "doc_id",
            "n_tok",
            (
                -F.expr("(2 * _nl6 + n_tok) div (2 * n_tok)").cast("double")
                / 1e6
            ).alias("avg_logprob"),
        )
    )


# --- merge/upsert (MERGE INTO semantics as a declarative plan) --------------


@register(
    "corpus_merge_upsert",
    oracle="""
WITH batch AS (
  SELECT doc_id, text || ' [rev2]' AS text, lang, source
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source
  FROM documents WHERE doc_id % 13 = 0
),
merged AS (
  SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
         coalesce(b.text, d.text) AS text,
         CASE WHEN b.doc_id IS NULL THEN 'keep'
              WHEN d.doc_id IS NULL THEN 'insert'
              ELSE 'update' END AS action
  FROM documents d FULL JOIN batch b ON d.doc_id = b.doc_id
)
SELECT doc_id, action, md5(text) AS text_md5 FROM merged
""",
    doc="MERGE INTO semantics (Delta/Iceberg-style upsert) as a pure "
    "declarative plan: an incoming batch (revised rows for doc_id %% 7, "
    "brand-new rows keyed past the corpus range for doc_id %% 13) "
    "full-outer-joined to the corpus on the key — matched rows take the "
    "batch version ('update'), unmatched batch rows append ('insert'), "
    "untouched corpus rows pass through ('keep'). Every output row is "
    "tagged with its action and the md5 of its final text, so the "
    "oracle value-checks the complete merge result, not just counts. "
    "Scale shape: ONE equi-join shuffle on the key — the same plan a "
    "lakehouse MERGE compiles to for its find-touched-files phase; at "
    "100 TB the batch side is typically small enough to broadcast, "
    "turning the merge map-side.",
)
def corpus_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    updates = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" [rev2]")).alias("text")
    )
    inserts = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    batch = updates.unionByName(inserts)
    d = docs.select(F.col("doc_id").alias("d_id"), F.col("text").alias("d_text"))
    b = batch.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"))
    merged = d.join(b, d.d_id == b.b_id, "full").select(
        F.coalesce("b_id", "d_id").alias("doc_id"),
        F.coalesce("b_text", "d_text").alias("text"),
        F.when(F.col("b_id").isNull(), F.lit("keep"))
        .when(F.col("d_id").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )
    return merged.select("doc_id", "action", F.md5("text").alias("text_md5"))


# --- content-defined chunking (Rabin-style CDC) -----------------------------

CDC_WINDOW = 16  # rolling-hash window (chars)
CDC_TOP = 50


def cdc_chunk_rows(docs: DataFrame) -> DataFrame:
    """Per-chunk rows (doc_id, s, chunk_text, chunk_md5, clen) for the
    CDC boundary scheme — shared by the registered query and the
    reassembly invariant test."""
    text = F.col("text")
    seq = F.sequence(
        F.lit(1), F.greatest(F.length(text) - (CDC_WINDOW - 1), F.lit(1))
    )
    bpos = F.filter(
        seq,
        lambda i: (i == 1)
        | (F.substring(F.md5(text.substr(i, F.lit(CDC_WINDOW))), 32, 1) == "0"),
    )
    d = docs.select("doc_id", "text", bpos.alias("bpos"))
    ends = F.concat(
        F.slice(F.col("bpos"), 2, F.greatest(F.size("bpos") - 1, F.lit(0))),
        F.array(F.length(text) + 1),
    )
    spans = d.select(
        "doc_id",
        "text",
        F.explode(
            F.zip_with(
                F.col("bpos"), ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
            )
        ).alias("z"),
    )
    return spans.select(
        "doc_id",
        F.col("z.s").alias("s"),
        text.substr(F.col("z.s"), F.col("z.e") - F.col("z.s")).alias("chunk_text"),
        F.md5(text.substr(F.col("z.s"), F.col("z.e") - F.col("z.s"))).alias(
            "chunk_md5"
        ),
        (F.col("z.e") - F.col("z.s")).alias("clen"),
    )



@register(
    "corpus_cdc_chunks",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text,
         list_filter(range(1, greatest(length(text) - {CDC_WINDOW - 1}, 1) + 1),
                     i -> i = 1 OR substr(md5(substr(text, i, {CDC_WINDOW})), 32, 1) = '0')
           AS bpos
  FROM documents
),
spans AS (
  SELECT doc_id, text,
         unnest(list_zip(bpos, list_append(bpos[2:], length(text) + 1))) AS z
  FROM d
),
chunks AS (
  SELECT doc_id,
         md5(substr(text, z[1], z[2] - z[1])) AS chunk_md5,
         z[2] - z[1] AS clen
  FROM spans
)
SELECT chunk_md5,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occ,
       min(clen) AS clen
FROM chunks
GROUP BY chunk_md5
HAVING count(DISTINCT doc_id) >= 2 AND min(clen) >= 8
ORDER BY n_docs DESC, n_occ DESC, chunk_md5
LIMIT {CDC_TOP}
""",
    doc="Content-defined chunking (Rabin-style CDC): chunk boundaries "
    "where the hash of a 16-char sliding window ends in a chosen nibble "
    "(p=1/16, mean chunk ~16 chars), then corpus-wide reuse of the "
    "resulting chunks — the dedup primitive that, unlike fixed-size "
    "chunking, survives insertions/shifts because boundaries move with "
    "content. Plan shape: the boundary scan is a per-row higher-order "
    "filter (codegen'd md5 inside the lambda — zero shuffle, the "
    "document never leaves its partition), chunks explode to 16-byte "
    "hashes BEFORE the only shuffle (the reuse hash-agg), and top-k is "
    "TakeOrderedAndProject. At 100 TB this is exactly how backup/"
    "object-store dedup and long-doc near-dedup pipelines shard: "
    "shuffle bytes = chunk digests, never text.",
)
def corpus_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = cdc_chunk_rows(load_table(spark, "documents", sf_dir))
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
            F.min("clen").alias("clen"),
        )
        .filter((F.col("n_docs") >= 2) & (F.col("clen") >= 8))
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("chunk_md5"))
        .limit(CDC_TOP)
    )


# --- n-gram novelty vs a reference corpus ------------------------------------

NOVEL_K = 5  # word n-gram size for novelty scoring
REF_SOURCES = ("src0", "src1", "src2", "src3")  # the curated reference slice


@register(
    "corpus_ngram_novelty",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct({_kgrams_sql('toks', NOVEL_K)})) AS gram
  FROM toks
),
ref AS (
  SELECT DISTINCT gram FROM grams
  WHERE source IN ('src0', 'src1', 'src2', 'src3')
),
cand AS (
  SELECT doc_id, gram FROM grams
  WHERE source IS NULL OR source NOT IN ('src0', 'src1', 'src2', 'src3')
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) - count(r.gram) AS BIGINT) AS n_novel,
       round((count(*) - count(r.gram))::DOUBLE / count(*), 6) AS novelty
FROM cand c LEFT JOIN ref r USING (gram)
GROUP BY c.doc_id
""",
    doc="Per-doc novelty vs a curated reference corpus: the fraction of "
    "a candidate doc's distinct word 5-grams that appear nowhere in "
    "the reference slice (sources src0-src3 stand in). The dual of "
    "decontamination: high novelty selects docs that ADD content to a "
    "training mix, near-zero novelty flags paraphrase/boilerplate "
    "recycling. Shuffle profile: the reference's distinct-gram set is "
    "a hash-agg whose map-side partial collapses repeats before the "
    "exchange; the probe is a gram-keyed equi-join (broadcast when the "
    "reference fits, else both sides hash-partition on the gram — at "
    "100 TB swap the string key for an 8-byte xxhash64 to cut shuffle "
    "bytes ~10x); the per-doc agg shuffles (doc_id, counts) only.",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    grams = docs.select(
        "doc_id", "source", tokens_col(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(_kgrams_spark(NOVEL_K))).alias("gram"),
    )
    in_ref = F.col("source").isin(*REF_SOURCES)
    ref = grams.where(in_ref).select("gram").distinct()
    cand = grams.where(F.col("source").isNull() | ~in_ref).select("doc_id", "gram")
    joined = cand.join(ref.withColumn("hit", F.lit(1)), "gram", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        (F.count("*") - F.count("hit")).alias("n_novel"),
        F.round(
            (F.count("*") - F.count("hit")).cast("double") / F.count("*"), 6
        ).alias("novelty"),
    )


# --- bigram LM with Kneser-Ney smoothing ------------------------------------

KN_D = 0.75  # absolute discount


@register(
    "corpus_bigram_logprob",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
inst AS (
  SELECT doc_id,
         string_split(g.gram, ' ')[1] AS a,
         string_split(g.gram, ' ')[2] AS b
  FROM (
    SELECT doc_id, unnest({_kgrams_sql('toks', 2)}) AS gram FROM toks
  ) g
),
big AS (SELECT a, b, count(*) AS c_ab FROM inst GROUP BY a, b),
ctx AS (SELECT a, sum(c_ab) AS c_a, count(*) AS n_fol FROM big GROUP BY a),
pre AS (SELECT b, count(*) AS n_pre FROM big GROUP BY b),
t AS (SELECT count(*) AS n_types FROM big)
SELECT i.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       -- exact-integer mean of per-bigram 1e-6-unit logprobs: the sum
       -- is an exact BIGINT (order-independent), closed by one
       -- round-half-away-from-zero integer division; // floors but the
       -- operands are made non-negative first so it equals truncation
       -(((2 * sum(CAST(round(-ln(
           (c_ab - {KN_D}) / c_a
           + ({KN_D} * n_fol / c_a) * (n_pre::DOUBLE / n_types)
         ) * 1000000) AS BIGINT)) + count(*)) // (2 * count(*)))
       ) / 1000000.0 AS avg_logprob
FROM inst i
JOIN big USING (a, b)
JOIN ctx USING (a)
JOIN pre USING (b)
CROSS JOIN t
GROUP BY i.doc_id
""",
    doc="Bigram LM document scoring with interpolated Kneser-Ney "
    "smoothing: P(b|a) = max(c(ab)-D,0)/c(a) + D*N1+(a.)/c(a) * "
    "N1+(.b)/T — the real perplexity-filter step up from the unigram "
    "proxy (continuation probability ranks 'Francisco' low even though "
    "'San Francisco' is frequent). Context counts derive from the "
    "bigram table itself (c(a) = sum_b c(ab)), so the model is three "
    "hash-aggs over one bigram materialization; per-doc scoring joins "
    "the instance stream to the (vocab-sized, broadcastable-at-scale) "
    "model tables and means the log-probs per doc. Every bigram "
    "probability is strictly positive by construction (c_ab >= 1 > D, "
    "continuation mass > 0), so ln never sees zero.",
)
def corpus_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    inst = (
        docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(_kgrams_spark(2)).alias("gram"))
        .select(
            "doc_id",
            F.split("gram", " ")[0].alias("a"),
            F.split("gram", " ")[1].alias("b"),
        )
    )
    big = inst.groupBy("a", "b").agg(F.count("*").alias("c_ab")).localCheckpoint(
        eager=True
    )
    ctx = big.groupBy("a").agg(
        F.sum("c_ab").alias("c_a"), F.count("*").alias("n_fol")
    )
    pre = big.groupBy("b").agg(F.count("*").alias("n_pre"))
    t = big.agg(F.count("*").alias("n_types"))
    d = F.lit(KN_D)
    p = (F.col("c_ab") - d) / F.col("c_a") + (
        d * F.col("n_fol") / F.col("c_a")
    ) * (F.col("n_pre").cast("double") / F.col("n_types"))
    return (
        inst.join(big, ["a", "b"])
        .join(F.broadcast(ctx), "a")
        .join(F.broadcast(pre), "b")
        .crossJoin(F.broadcast(t))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            # per-bigram logprob rounded to an exact 1e-6-unit BIGINT
            # BEFORE summing: the sum is order-independent (a raw
            # avg(log) double accumulation is not), and the mean closes
            # with one half-away-from-zero integer division — the same
            # exact-integer idiom as the money sums. -ln(p) >= 0 since
            # p < 1 by construction.
            F.sum(F.round(-F.log(p) * 1e6).cast("long")).alias("_nl6"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                -F.expr("(2 * _nl6 + n_bigrams) div (2 * n_bigrams)").cast(
                    "double"
                )
                / 1e6
            ).alias("avg_logprob"),
        )
    )


# --- deterministic augmentation (token dropout) ------------------------------


@register(
    "corpus_augment_dropout",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
kept AS (
  SELECT doc_id, toks,
         list_filter(list_transform(toks, (x, i) -> {{'t': x, 'p': i}}),
                     s -> substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                      CAST(s.p AS VARCHAR)), 1, 1) <> '0')
           AS kept
  FROM toks
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(toks) - len(kept) AS BIGINT) AS n_dropped,
       array_to_string(list_transform(kept, s -> s.t), ' ') AS aug_text
FROM kept
""",
    doc="Deterministic data augmentation: token dropout gated by "
    "md5(doc_id:position) — ~1/16 of tokens drop, the word-dropout "
    "regularization an LLM pipeline applies to oversampled slices. No "
    "RNG state: the same (doc, position) drops on every run, every "
    "partitioning, every engine — augmented corpora are diffable and "
    "resumable exactly like the deterministic-hash sampler. Zero "
    "shuffle, pure row-local array expressions; scales linearly with "
    "splits.",
)
def corpus_augment_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    kept_expr = (
        "filter(transform(toks, (x, i) -> named_struct('t', x, 'p', i + 1)), "
        "s -> substring(md5(concat(CAST(doc_id AS STRING), ':', "
        "CAST(s.p AS STRING))), 1, 1) != '0')"
    )
    # NULL text => NULL outputs (Spark's size(NULL) is -1, not NULL —
    # guard so both engines agree on the degenerate contract)
    out_expr = (
        f"named_struct("
        f"'n_tokens', IF(toks IS NULL, CAST(NULL AS BIGINT), CAST(size(toks) AS BIGINT)), "
        f"'n_dropped', IF(toks IS NULL, CAST(NULL AS BIGINT), CAST(size(toks) - size(kept) AS BIGINT)), "
        f"'aug_text', array_join(transform(kept, s -> s.t), ' '))"
    )
    # bind `kept` once as a lambda var + generator barrier (the
    # CollapseProject re-evaluation trap — see ta_winnow_fingerprint)
    full = (
        f"explode(array(transform(array({kept_expr}), "
        f"kept -> {out_expr})[0]))"
    )
    o = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).select("doc_id", F.expr(full).alias("o"))
    return o.select(
        "doc_id",
        F.col("o.n_tokens").alias("n_tokens"),
        F.col("o.n_dropped").alias("n_dropped"),
        F.col("o.aug_text").alias("aug_text"),
    )


# --- soft dedup (downweighting) ----------------------------------------------


@register(
    "corpus_soft_dedup_weights",
    oracle="""
WITH fp AS (
  SELECT doc_id,
         substr(sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16)
           AS fingerprint
  FROM documents
),
sizes AS (
  SELECT fingerprint, count(*) AS cluster_size FROM fp GROUP BY fingerprint
)
SELECT doc_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       round(1.0 / cluster_size, 6) AS weight
FROM fp JOIN sizes USING (fingerprint)
""",
    doc="Soft dedup (SoftDeDup / duplicate-aware loss weighting): "
    "instead of DROPPING duplicates, every doc gets training weight "
    "1/cluster_size over its normalized-content cluster — each unique "
    "content contributes unit mass regardless of copy count, which "
    "preserves naturally-duplicated distributional signal that hard "
    "dedup destroys. One fingerprint hash-agg (map-side partial) plus "
    "the size join back — broadcast when the duplicated slice is "
    "small, else both sides hash on the 8-byte fingerprint.",
)
def corpus_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mrc_spark_jobs_pubmed_spark.operators import textstats as X

    docs = load_table(spark, "documents", sf_dir)
    fp = docs.select("doc_id", X.fingerprint(F.col("text")).alias("fingerprint"))
    sizes = fp.groupBy("fingerprint").agg(F.count("*").alias("cluster_size"))
    return fp.join(sizes, "fingerprint").select(
        "doc_id",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight"),
    )


# --- RAG-style overlapping chunking -----------------------------------------

RAG_WINDOW = 64  # tokens per chunk
RAG_STRIDE = 48  # tokens between chunk starts (overlap = 16)


@register(
    "corpus_rag_chunks",
    oracle=f"""
SELECT doc_id, chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       CAST(CASE WHEN chunk_id = 0 THEN 0
                 ELSE least({RAG_WINDOW} - {RAG_STRIDE},
                            prev_len - {RAG_STRIDE}) END AS BIGINT)
         AS overlap_prev,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM (
  SELECT doc_id, c AS chunk_id,
         c * {RAG_STRIDE} AS start_tok,
         list_slice(toks, c * {RAG_STRIDE} + 1,
                    c * {RAG_STRIDE} + {RAG_WINDOW}) AS chunk,
         len(list_slice(toks, (c - 1) * {RAG_STRIDE} + 1,
                        (c - 1) * {RAG_STRIDE} + {RAG_WINDOW})) AS prev_len
  FROM (
    SELECT doc_id, toks,
           unnest(range(0, CAST(ceil(greatest(len(toks) - {RAG_WINDOW}
                                              + {RAG_STRIDE}, 1)
                                     / {RAG_STRIDE}.0) AS BIGINT))) AS c
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    WHERE len(toks) > 0
  )
)
""",
    doc="RAG-style overlapping chunker: sliding {}-token windows every "
    "{} tokens (16-token overlap), emitting per-chunk start offset, "
    "size, overlap-with-previous, and content hash — the "
    "retrieval-index splitter, vs corpus_chunk_tokens' disjoint "
    "context-window splitter. Chunk count is "
    "ceil(max(n - W + S, 1) / S), so the tail is covered exactly once "
    "and short docs yield one chunk. Same scale shape as the disjoint "
    "chunker: sequence+explode row expansion is NARROW — chunks stay "
    "on their doc's partition, no shuffle anywhere in the plan (the "
    "hash is per-row); at 100 TB the op is embarrassingly parallel "
    "and output volume is input x W/S.".format(RAG_WINDOW, RAG_STRIDE),
)
def corpus_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).where(F.size("toks") > 0)
    n_chunks = F.ceil(
        F.greatest(
            F.size("toks") - F.lit(RAG_WINDOW) + F.lit(RAG_STRIDE), F.lit(1)
        )
        / F.lit(float(RAG_STRIDE))
    ).cast("long")
    exploded = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    chunk = F.slice(
        F.col("toks"),
        (F.col("chunk_id") * RAG_STRIDE + 1).cast("int"),
        RAG_WINDOW,
    )
    prev_chunk = F.slice(
        F.col("toks"),
        ((F.col("chunk_id") - 1) * RAG_STRIDE + 1).cast("int"),
        RAG_WINDOW,
    )
    overlap = (
        F.when(F.col("chunk_id") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.lit(RAG_WINDOW - RAG_STRIDE).cast("long"),
                F.size(prev_chunk).cast("long") - RAG_STRIDE,
            )
        )
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * RAG_STRIDE).cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        overlap.alias("overlap_prev"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# --- k-anonymity audit ------------------------------------------------------

KANON_K = 5
KANON_LEN_BUCKET = 500  # n_chars bucket width for the quasi-identifier


@register(
    "corpus_k_anonymity",
    oracle=f"""
WITH cells AS (
  SELECT lang, source,
         n_chars // {KANON_LEN_BUCKET} AS len_bucket,
         count(*) AS n_docs,
         min(doc_id) AS sample_doc_id
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT lang, source, CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(n_docs AS BIGINT) AS n_docs, sample_doc_id
FROM cells
WHERE n_docs < {KANON_K}
""",
    doc="k-anonymity audit (k={k}): every quasi-identifier cell — "
    "(lang, source, length bucket) — holding fewer than k documents, "
    "i.e. the rows where metadata alone narrows a document to a "
    "re-identifiable handful. The release-gating privacy check that "
    "runs BEFORE a corpus ships alongside its metadata; the flagged "
    "cells are the ones to generalize (widen buckets) or suppress. "
    "Pure integer bucketing + one hash-agg with map-side partials; "
    "output is bounded by the violating-cell count, and the cell "
    "domain (langs x sources x buckets) is metadata-sized at any "
    "corpus volume.".format(k=KANON_K),
)
def corpus_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(
            "lang",
            "source",
            F.expr(f"n_chars div {KANON_LEN_BUCKET}").alias("len_bucket"),
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("sample_doc_id"),
        )
        .where(F.col("n_docs") < KANON_K)
    )


# --- tokenizer vocabulary coverage ------------------------------------------

VOCAB_SIZES = (100, 500, 2000)


@register(
    "corpus_vocab_coverage",
    oracle=f"""
WITH toks AS (
  SELECT d.lang, t.tok AS tok
  FROM (SELECT lang, {tokens_sql('text')} AS toklist FROM documents) d,
       unnest(d.toklist) AS t(tok)
),
freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS rnk FROM freq
),
marked AS (
  SELECT t.lang, r.rnk FROM toks t JOIN ranked r USING (tok)
)
SELECT lang,
       count(*) AS n_tokens,
       {", ".join(
           f"CAST((sum(CASE WHEN rnk <= {v} THEN 1 ELSE 0 END) * 1000000)"
           f" // count(*) AS BIGINT) AS cov{v}_u6"
           for v in VOCAB_SIZES
       )}
FROM marked
GROUP BY lang
""",
    doc="Tokenizer vocabulary coverage per language: the fraction of "
    "corpus tokens covered by the global top-100/500/2000 token "
    "vocabulary, in exact 1e-6 integer units — the sizing curve that "
    "decides a vocab budget and EXPOSES which languages a shared "
    "vocabulary starves (low coverage = heavy OOV/byte-fallback tax; "
    "the fairness companion to ta_tokenizer_fertility). Scale shape: "
    "one vocab hash-agg, a rank over the vocab domain, one "
    "token->rank join (broadcast at real vocab sizes), and a "
    "|langs|-row rollup with map-side partials. The multi-threshold "
    "sweep rides in ONE pass as conditional sums.",
)
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "lang", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    ranked = freq.select(
        "tok",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("tok"))).alias(
            "rnk"
        ),
    )
    marked = toks.join(F.broadcast(ranked), "tok")
    aggs = [F.count("*").alias("n_tokens")] + [
        F.expr(
            f"CAST((sum(CASE WHEN rnk <= {v} THEN 1 ELSE 0 END) * 1000000)"
            f" div count(*) AS LONG)"
        ).alias(f"cov{v}_u6")
        for v in VOCAB_SIZES
    ]
    return marked.groupBy("lang").agg(*aggs)


# --- per-source data card ----------------------------------------------------


@register(
    "corpus_datacard_by_source",
    oracle=f"""
WITH base AS (
  SELECT source, lang, doc_id, n_chars,
         len({tokens_sql('text')}) AS n_tok,
         md5(text) AS h
  FROM documents
),
lang_mix AS (
  SELECT source, lang, count(*) AS n FROM base GROUP BY source, lang
),
top_lang AS (
  SELECT source,
         max(struct_pack(n := n, neg_lang := lang)).neg_lang AS top_lang
  FROM (SELECT source, lang, n FROM lang_mix) GROUP BY source
)
SELECT b.source,
       count(*) AS n_docs,
       CAST(count(DISTINCT b.lang) AS BIGINT) AS n_langs,
       any_value(t.top_lang) AS top_lang,
       CAST(sum(b.n_chars) AS BIGINT) AS total_chars,
       CAST(sum(b.n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(b.n_tok) // count(*) AS BIGINT) AS avg_tokens,
       CAST(((count(*) - count(DISTINCT b.h)) * 1000000) // count(*)
            AS BIGINT) AS dup_rate_u6
FROM base b JOIN top_lang t USING (source)
GROUP BY b.source
""",
    doc="Per-source data card: the one-row-per-source summary a corpus "
    "release ships — document and language counts, dominant language "
    "(frequency-max, ties by max lang string — deterministic), size "
    "totals, average length, and the exact-duplicate rate in 1e-6 "
    "units (1 - distinct md5 / docs). The composite face of the "
    "quality/dedup/mixing families: one scan computes every "
    "ingredient, and the output is |sources|-sized at any corpus "
    "volume. All integer arithmetic; the only 'model' is counting. "
    "At 100 TB this is the nightly corpus-health report — per-source "
    "rows diff bit-for-bit across runs, so a drifting source shows "
    "as a changed row, not a vibe.",
)
def corpus_datacard_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import tokens_col

    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(tokens_col(F.col("text"))).alias("n_tok"),
        F.md5("text").alias("h"),
    )
    lang_mix = base.groupBy("source", "lang").agg(F.count("*").alias("n"))
    top_lang = (
        lang_mix.groupBy("source")
        .agg(
            F.max(
                F.struct(F.col("n").alias("n"), F.col("lang").alias("neg_lang"))
            ).alias("m")
        )
        .select("source", F.col("m.neg_lang").alias("top_lang"))
    )
    return (
        base.join(F.broadcast(top_lang), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.first("top_lang").alias("top_lang"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.expr("CAST(sum(n_tok) div count(*) AS LONG)").alias(
                "avg_tokens"
            ),
            F.expr(
                "CAST(((count(*) - count(DISTINCT h)) * 1000000)"
                " div count(*) AS LONG)"
            ).alias("dup_rate_u6"),
        )
    )


# --- duplicated-prefix detection --------------------------------------------

PREFIX_W = 10  # tokens in the prefix key


@register(
    "corpus_prefix_dup",
    oracle=f"""
WITH pref AS (
  SELECT doc_id, n_chars,
         md5(coalesce(array_to_string(
           list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> length(t) > 0)[1:{PREFIX_W}], ' '), ''))
           AS prefix_hash
  FROM documents
)
SELECT prefix_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS canonical_id,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM pref
GROUP BY prefix_hash
HAVING count(*) >= 2
""",
    doc=f"Duplicated-prefix detection: docs grouped by the md5 of their "
    f"first {PREFIX_W} whitespace tokens — the crawl-artifact signature "
    "(boilerplate headers, template openings, truncated re-crawls of "
    "the same page) that exact dedup misses when tails differ and "
    "MinHash under-weights because the overlap is positional, not "
    "global. Reports each prefix clone group with its canonical "
    "(min-id) member and the bytes at stake; composition: feed "
    "canonical_id to the keep-best apply exactly as dedup_exact "
    "groups. Scale shape: a zero-shuffle prefix-key projection (the "
    "prefix needs only the first ~100 bytes of each doc — a columnar "
    "scan reads just that) + ONE hash-agg shuffling 16-byte keys "
    "with map-side partials; the HAVING filter makes output "
    "clone-groups only.",
)
def corpus_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    pref = docs.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.coalesce(
                F.array_join(
                    F.slice(tokens_col(F.col("text")), 1, PREFIX_W), " "
                ),
                F.lit(""),
            )
        ).alias("prefix_hash"),
    )
    return (
        pref.groupBy("prefix_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .where(F.col("n_docs") >= 2)
    )


# --- corpus snapshot diff ---------------------------------------------------

_NIB = "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {p}, 1)) - 1)"


@register(
    "corpus_snapshot_diff",
    oracle=f"""
WITH gates AS (
  SELECT doc_id, source, n_chars, text,
         {_NIB.format(p=1)} <> 0 AS in_a,
         {_NIB.format(p=2)} <> 0 AS in_b,
         {_NIB.format(p=3)} < 4 AS rev_gate
  FROM documents
),
a AS (
  SELECT doc_id, source, n_chars, md5(text) AS h FROM gates WHERE in_a
),
b AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN rev_gate THEN md5(text || ' [rev2]') ELSE md5(text) END
           AS h
  FROM gates WHERE in_b
),
diff AS (
  SELECT coalesce(a.source, b.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.h <> b.h THEN 'changed'
              ELSE 'unchanged' END AS status,
         coalesce(b.n_chars, a.n_chars) AS n_chars
  FROM a FULL OUTER JOIN b USING (doc_id)
)
SELECT source, status,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM diff
GROUP BY source, status
""",
    doc="Corpus snapshot diff: the added / removed / changed / unchanged "
    "breakdown (per source, with byte volume) between two corpus "
    "versions — the audit an incremental training-data refresh runs "
    "before deciding what to re-tokenize, re-dedup, and re-shard "
    "instead of rebuilding the corpus (the batch analogue of the CDC "
    "changelog, keyed on CONTENT hash so metadata-only rewrites don't "
    "count as changes). The two snapshots are carved from the fixture "
    "by independent deterministic md5-nibble gates (~94% membership "
    "each, 25% of the intersection revised) — the corpus_sample_hash "
    "idiom, so both engines and any partitioning see identical "
    "snapshots. Scale shape: content hashes are computed in the scan "
    "projection (no shuffle), the FULL OUTER join keys on doc_id — "
    "both sides arrive hash-partitioned from the same source — and "
    "the rollup is a (source x 4)-domain agg with map-side partials.",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    nib = (
        "(instr('0123456789abcdef', "
        "substr(md5(CAST(doc_id AS STRING)), {p}, 1)) - 1)"
    )
    gates = docs.select(
        "doc_id",
        "source",
        "n_chars",
        "text",
        F.expr(nib.format(p=1) + " <> 0").alias("in_a"),
        F.expr(nib.format(p=2) + " <> 0").alias("in_b"),
        F.expr(nib.format(p=3) + " < 4").alias("rev_gate"),
    )
    a = gates.where("in_a").select(
        "doc_id",
        F.col("source").alias("src_a"),
        F.col("n_chars").alias("nc_a"),
        F.md5("text").alias("h_a"),
    )
    b = gates.where("in_b").select(
        "doc_id",
        F.col("source").alias("src_b"),
        F.col("n_chars").alias("nc_b"),
        F.when(
            F.col("rev_gate"), F.md5(F.concat(F.col("text"), F.lit(" [rev2]")))
        )
        .otherwise(F.md5("text"))
        .alias("h_b"),
    )
    diff = a.join(b, "doc_id", "full_outer").select(
        F.coalesce("src_a", "src_b").alias("source"),
        F.when(F.col("h_a").isNull(), "added")
        .when(F.col("h_b").isNull(), "removed")
        .when(F.col("h_a") != F.col("h_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce("nc_b", "nc_a").alias("n_chars"),
    )
    return diff.groupBy("source", "status").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# --- weighted-blocklist filtering -------------------------------------------

BLOCKLIST_WEIGHTS = {"slow": 3, "merge": 2, "small": 1}
BLOCKLIST_TAU_U6 = 300_000  # weighted blocked-token density gate


def _blocklist_case(dialect: str) -> str:
    arms = " ".join(
        f"WHEN t = '{w}' THEN {c}" for w, c in BLOCKLIST_WEIGHTS.items()
    )
    return f"CASE {arms} ELSE 0 END"


@register(
    "corpus_blocklist_filter",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> length(t) > 0) AS toks
  FROM documents
),
s AS (
  SELECT doc_id, source, n_chars, len(toks) AS n_toks,
         coalesce(list_sum(list_transform(toks,
                    t -> {_blocklist_case('duckdb')})), 0) AS wscore
  FROM d
),
flagged AS (
  SELECT source, n_chars,
         CASE WHEN n_toks = 0 THEN 0
              ELSE (wscore * 1000000) // n_toks END > {BLOCKLIST_TAU_U6}
           AS blocked
  FROM s
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocked,
       CAST((sum(CASE WHEN blocked THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS block_rate_u6,
       CAST(sum(CASE WHEN blocked THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_blocked
FROM flagged
GROUP BY source
""",
    doc="Weighted-blocklist filtering (the C4/CCNet 'bad words' gate "
    "generalized): each blocklisted term carries a weight, a doc's "
    "score is the weighted blocked-token DENSITY in exact 1e-6 units "
    "(weights x occurrences over token count — density, not "
    "membership, so one incidental term does not kill a long "
    "document, the failure mode of naive list filters), and docs "
    "above the gate are reported per source with the volume at "
    "stake. The word list here is a 3-term fixture stand-in; the "
    "operator contract (weights, density, threshold, per-source "
    "report) is the production shape, and a real list is data, not "
    "code. Zero-shuffle per-row scoring (one codegen'd HOF pass, no "
    "explode), then a source-domain agg with map-side partials.",
)
def corpus_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    case = _blocklist_case("spark")
    s = docs.select(
        "source",
        "n_chars",
        F.size(tokens_col(F.col("text"))).alias("n_toks"),
        F.coalesce(
            F.expr(
                "aggregate(transform("
                "regexp_extract_all(text, '\\\\S+', 0),"
                f" t -> {case}), 0L, (acc, x) -> acc + x)"
            ),
            F.lit(0),
        ).alias("wscore"),
    )
    flagged = s.select(
        "source",
        "n_chars",
        (
            F.expr(
                "CASE WHEN n_toks = 0 THEN 0"
                " ELSE (wscore * 1000000) div n_toks END"
            )
            > BLOCKLIST_TAU_U6
        ).alias("blocked"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("blocked"), 1).otherwise(0))
        .cast("long")
        .alias("n_blocked"),
        F.expr(
            "CAST((sum(CASE WHEN blocked THEN 1 ELSE 0 END) * 1000000)"
            " div count(*) AS LONG)"
        ).alias("block_rate_u6"),
        F.sum(F.when(F.col("blocked"), F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("chars_blocked"),
    )


# --- cross-source n-gram overlap matrix -------------------------------------

OVERLAP_K = 5
OVERLAP_TOP = 30


@register(
    "corpus_source_overlap",
    oracle=f"""
WITH toks AS (
  SELECT source, {_TOKS_SQL} AS toks FROM documents
),
grams AS (
  SELECT DISTINCT source, gram FROM (
    SELECT source, unnest({_kgrams_sql('toks', OVERLAP_K)}) AS gram FROM toks
  )
),
marg AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b,
       CAST(p.n_common AS BIGINT) AS n_common,
       CAST(ma.n AS BIGINT) AS n_a,
       CAST(mb.n AS BIGINT) AS n_b,
       CAST((p.n_common * 1000000) // least(ma.n, mb.n) AS BIGINT)
         AS containment_u6
FROM pairs p
JOIN marg ma ON ma.source = p.source_a
JOIN marg mb ON mb.source = p.source_b
ORDER BY containment_u6 DESC, p.source_a, p.source_b
LIMIT {OVERLAP_TOP}
""",
    doc=f"Cross-source {OVERLAP_K}-gram overlap matrix: for every source "
    "pair, the count of shared distinct word n-grams and the "
    "CONTAINMENT of the smaller source (common / min) in exact 1e-6 "
    "units — the train/eval leakage audit between corpus components "
    "(is the 'books' slice quietly inside the 'web' slice?), the "
    "pairwise rollup of corpus_contamination/corpus_ngram_novelty "
    "which gate one candidate set against one reference. Scale "
    "shape: the corpus collapses to its distinct (gram, source) set "
    "first; the per-gram pair fan-out is bounded by |sources|^2 "
    "(sources are a catalog, not data — the triangle-count "
    "vocab-cap argument), marginals broadcast, output is at most "
    "C(|sources|, 2) rows.",
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    grams = (
        docs.select("source", tokens_col(F.col("text")).alias("toks"))
        .select("source", F.explode(_kgrams_spark(OVERLAP_K)).alias("gram"))
        .distinct()
    )
    marg = grams.groupBy("source").agg(F.count("*").alias("n"))
    a = grams.select(F.col("source").alias("source_a"), "gram").hint(
        "shuffle_hash"
    )
    b = grams.select(F.col("source").alias("source_b"), "gram")
    pairs = (
        a.join(b, "gram")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    ma = F.broadcast(
        marg.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    )
    mb = F.broadcast(
        marg.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    )
    return (
        pairs.join(ma, "source_a")
        .join(mb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(
                "CAST((n_common * 1000000) div least(n_a, n_b) AS LONG)"
            ).alias("containment_u6"),
        )
        .orderBy(F.desc("containment_u6"), "source_a", "source_b")
        .limit(OVERLAP_TOP)
    )


# --- weighted (PPS) systematic sampling -------------------------------------

PPS_K = 100  # target sample size


@register(
    "corpus_pps_sample",
    oracle=f"""
WITH w AS (
  SELECT doc_id, source, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS c
  FROM documents WHERE n_chars > 0
),
tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS t
        FROM documents WHERE n_chars > 0)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST((c * {PPS_K}) // t AS BIGINT) AS stratum
FROM w CROSS JOIN tot
WHERE (c * {PPS_K}) // t > ((c - n_chars) * {PPS_K}) // t
""",
    doc="Probability-proportional-to-size systematic sampling: docs are "
    "laid on the cumulative-weight (char-count) axis and one doc is "
    f"taken wherever the axis crosses a multiple of total/{PPS_K} — "
    "each doc's selection probability is proportional to its size, "
    "with EXACTLY the target count (+-1) and zero RNG state: pure "
    "integer cumsum + integer-division stratum compare, so the same "
    "sample on any engine or partitioning (the deterministic-gate "
    "discipline of corpus_sample_hash, extended to WEIGHTED "
    "sampling — the byte-budget-faithful way to draw eval slices or "
    "inspection samples from a corpus where doc sizes span 4 orders "
    "of magnitude and uniform-by-doc sampling over-represents "
    "shorts). Scale shape: one ordered cumsum window (at 100 TB, "
    "range-partitioned by the same key the corpus is already sorted "
    "on) + a 1-row total broadcast; the crossing predicate is "
    "per-row arithmetic; c*k stays in int64 through ~1e14 chars x "
    "k=100.",
)
def corpus_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("n_chars") > 0)
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = docs.select(
        "doc_id", "source", "n_chars", F.sum("n_chars").over(w).alias("c")
    )
    tot = docs.agg(F.sum("n_chars").cast("long").alias("t"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .where(
            F.expr(f"(c * {PPS_K}) div t")
            > F.expr(f"((c - n_chars) * {PPS_K}) div t")
        )
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.expr(f"CAST((c * {PPS_K}) div t AS LONG)").alias("stratum"),
        )
    )


# --- quality-threshold retention sweep --------------------------------------

QSWEEP_TAUS = (300_000, 400_000, 500_000, 600_000, 700_000, 800_000)


@register(
    "corpus_quality_threshold_sweep",
    oracle=f"""
WITH s AS (
  SELECT doc_id, n_chars, len(toks) AS n_toks,
         CASE WHEN len(toks) = 0 THEN 0
              ELSE (len(list_distinct(toks)) * 1000000) // len(toks) END
           AS score_u6
  FROM (SELECT doc_id, n_chars, {_TOKS_SQL} AS toks FROM documents)
),
tot AS (
  SELECT count(*) AS n_all, CAST(sum(n_chars) AS BIGINT) AS chars_all FROM s
),
taus AS (SELECT unnest([{', '.join(str(t) for t in QSWEEP_TAUS)}]) AS tau_u6)
SELECT CAST(t.tau_u6 AS BIGINT) AS tau_u6,
       CAST(count(*) FILTER (s.score_u6 >= t.tau_u6) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(s.n_chars) FILTER (s.score_u6 >= t.tau_u6), 0)
            AS BIGINT) AS chars_kept,
       CAST((count(*) FILTER (s.score_u6 >= t.tau_u6) * 1000000)
            // (SELECT n_all FROM tot) AS BIGINT) AS kept_share_u6
FROM taus t CROSS JOIN s
GROUP BY t.tau_u6
""",
    doc="Quality-threshold retention sweep: how much corpus (docs and "
    "bytes) survives at each candidate cutoff of the distinct-token-"
    "ratio quality signal, in exact 1e-6 integer units — the tuning "
    "curve you read BEFORE fixing a quality gate (the operator-family "
    "sibling of dedup_banding_tradeoff and sim_ivf_nprobe_recall: "
    "cost/recall knobs measured, not guessed; here the knob is "
    "data-retention vs strictness). Scale shape: the per-doc score is "
    "one zero-shuffle pass; the sweep joins a |taus|-row broadcast "
    "and aggregates on the tau domain — one corpus scan for the "
    "whole curve, not one per candidate threshold.",
)
def corpus_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    s = docs.select(
        "n_chars",
        tokens_col(F.col("text")).alias("toks"),
    ).select(
        "n_chars",
        F.expr(
            "CASE WHEN size(toks) = 0 THEN 0"
            " ELSE (size(array_distinct(toks)) * 1000000) div size(toks) END"
        ).alias("score_u6"),
    )
    tot = s.agg(F.count("*").alias("n_all"))
    taus = spark.createDataFrame(
        [(t,) for t in QSWEEP_TAUS], "tau_u6 long"
    )
    kept = F.col("score_u6") >= F.col("tau_u6")
    return (
        s.crossJoin(F.broadcast(taus))
        .groupBy("tau_u6")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_kept"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tau_u6",
            "n_kept",
            "chars_kept",
            F.expr("CAST((n_kept * 1000000) div n_all AS LONG)").alias(
                "kept_share_u6"
            ),
        )
    )


# --- per-source boilerplate profile ------------------------------------------

BOILER_MIN_SHARE_U6 = 100_000  # line is boilerplate in a source at >= 10% DF


def _register_boilerplate_profile() -> None:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import (
        pseudo_lines,
        pseudo_lines_sql,
    )

    lines_sql = pseudo_lines_sql("text")

    @register(
        "corpus_boilerplate_profile",
        oracle=f"""
WITH src_docs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
lines AS (
  SELECT DISTINCT d.doc_id, d.source, t.line
  FROM (SELECT doc_id, source, {lines_sql} AS ls FROM documents) d,
       unnest(d.ls) AS t(line)
),
df AS (
  SELECT source, md5(line) AS line_key, count(*) AS line_df,
         min(line) AS sample_line
  FROM lines GROUP BY source, md5(line)
)
SELECT f.source, f.line_key,
       CAST(f.line_df AS BIGINT) AS line_df,
       s.n_docs,
       CAST(f.line_df * 1000000 // s.n_docs AS BIGINT) AS df_share_u6,
       f.sample_line
FROM df f JOIN src_docs s USING (source)
WHERE f.line_df * 1000000 >= {BOILER_MIN_SHARE_U6} * s.n_docs
ORDER BY f.source, df_share_u6 DESC, f.line_key
""",
        doc="Per-SOURCE boilerplate profile: lines whose within-source "
        "document frequency is >= 10% — the nav/footer/disclaimer "
        "signature of a scraped site that corpus-wide line dedup "
        "(corpus_line_dedup) underweights when the source is a small "
        "fraction of the corpus. Output is the audit table (source, "
        "line md5 key, DF, share in 1e-6 units, a deterministic sample "
        "line) a pipeline turns into per-source strip rules. DISTINCT "
        "(doc, line) first so a line repeated within one doc counts "
        "once; share threshold compared in cross-multiplied integers "
        "(df*1e6 >= tau*n_docs) — no float division. Scale shape: "
        "narrow line projection, one (source, line-hash) hash-agg with "
        "map-side partials, broadcast join to per-source doc counts; "
        "output is bounded by lines/share >= 10%, a tiny set by "
        "construction.",
    )
    def corpus_boilerplate_profile(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_table(spark, "documents", sf_dir)
        src_docs = docs.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs")
        )
        lines = docs.select(
            "doc_id",
            "source",
            F.explode(pseudo_lines(F.col("text"))).alias("line"),
        ).distinct()
        df = lines.groupBy("source", F.md5("line").alias("line_key")).agg(
            F.count("*").cast("long").alias("line_df"),
            F.min("line").alias("sample_line"),
        )
        return (
            df.join(F.broadcast(src_docs), "source")
            .where(
                F.col("line_df") * 1_000_000
                >= F.lit(BOILER_MIN_SHARE_U6) * F.col("n_docs")
            )
            .select(
                "source",
                "line_key",
                "line_df",
                "n_docs",
                F.expr("CAST(line_df * 1000000 div n_docs AS BIGINT)").alias(
                    "df_share_u6"
                ),
                "sample_line",
            )
            .orderBy("source", F.desc("df_share_u6"), "line_key")
        )


_register_boilerplate_profile()


# --- CCNet perplexity buckets -------------------------------------------------


@register(
    "corpus_perplexity_buckets",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.tok AS tok
  FROM (SELECT doc_id, {_TOKS_SQL} AS toklist FROM documents),
       unnest(toklist) AS t(tok)
),
vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tot AS (SELECT sum(n) AS total FROM vocab),
scored AS (
  SELECT doc_id,
         count(*) AS n_tok,
         (2 * sum(CAST(round(-ln(n::DOUBLE / total) * 1000000) AS BIGINT))
          + count(*)) // (2 * count(*)) AS nll_u6
  FROM toks JOIN vocab USING (tok) CROSS JOIN tot
  GROUP BY doc_id
),
bucketed AS (
  SELECT doc_id, n_tok, nll_u6,
         ntile(3) OVER (ORDER BY nll_u6 ASC, doc_id ASC) AS b
  FROM scored
)
SELECT CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(min(nll_u6) AS BIGINT) AS min_nll_u6,
       CAST(max(nll_u6) AS BIGINT) AS max_nll_u6
FROM bucketed
GROUP BY bucket
ORDER BY min_nll_u6
""",
    doc="CCNet head/middle/tail quality buckets: per-doc unigram-LM "
    "negative log-likelihood per token (the corpus_unigram_logprob "
    "score in exact 1e-6 integer units — order-independent sum, "
    "integer half-up mean), docs split into NLL terciles by ntile(3) "
    "with doc_id tie-breaks (fully deterministic — an equal-score run "
    "straddling a tercile boundary splits identically on both "
    "engines). head = most in-distribution, the bucket CCNet keeps "
    "outright; tail = candidates for drop or LM re-score. Output is "
    "the bucket datacard (doc count, token mass, NLL range). Scale "
    "shape: the scoring aggs as in corpus_unigram_logprob (top-V "
    "broadcast vocab at real scale); the tercile is ONE global sort "
    "of |docs| scalar rows, and at 100 TB the same contract is served "
    "by approx percentile cuts with a documented tolerance.",
)
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    # Tokenize ONCE and collapse to per-doc token counts before any
    # join: the vocab build and the scoring join both consume the
    # checkpointed (doc, tok, c) table, so the regex pass runs once and
    # the tok-keyed shuffle ships distinct (doc, tok) pairs (with the
    # count as weight) instead of the raw token stream — same exact
    # integer sum, since NLL per (doc, tok) is c * round(-ln(n/total)*1e6).
    doc_tok = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab = doc_tok.groupBy("tok").agg(F.sum("c").alias("n"))
    tot = vocab.agg(F.sum("n").alias("total"))
    scored = (
        doc_tok.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tok"),
            F.sum(
                F.col("c")
                * F.round(
                    -F.log(F.col("n").cast("double") / F.col("total")) * 1e6
                ).cast("long")
            ).alias("_nl6"),
        )
        .select(
            "doc_id",
            "n_tok",
            F.expr("(2 * _nl6 + n_tok) div (2 * n_tok)").alias("nll_u6"),
        )
    )
    bucketed = scored.withColumn(
        "b", F.ntile(3).over(Window.orderBy(F.asc("nll_u6"), F.asc("doc_id")))
    )
    return (
        bucketed.groupBy(
            F.when(F.col("b") == 1, "head")
            .when(F.col("b") == 2, "middle")
            .otherwise("tail")
            .alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("nll_u6").cast("long").alias("min_nll_u6"),
            F.max("nll_u6").cast("long").alias("max_nll_u6"),
        )
        .orderBy("min_nll_u6")
    )


# --- weighted sampling without replacement (Efraimidis–Spirakis) --------------

AES_K = 100  # sample size


def _register_aes_sample() -> None:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _hex2long

    h2l = _hex2long("md5(CAST(doc_id AS VARCHAR))", 1)

    @register(
        "corpus_aes_weighted_sample",
        oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         ln(({h2l} + 0.5) / 4294967296.0) / n_chars AS k
  FROM documents WHERE n_chars > 0
)
SELECT CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT) AS rank,
       doc_id, source, n_chars,
       CAST(round(k * 1000000000) AS BIGINT) AS key_n9
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {AES_K}
""",
        doc="Weighted sampling WITHOUT replacement (Efraimidis–Spirakis "
        f"A-ES): top-{AES_K} docs by key ln(u)/w with w = n_chars and "
        "u a (0,1) uniform derived from md5(doc_id) — equivalent to "
        "ranking u^(1/w), so inclusion probability tracks size "
        "exactly like true weighted draw-without-replacement. Zero "
        "RNG state: the hash-uniform makes the sample a pure function "
        "of the data, reproducible on any engine or partitioning "
        "(both engines evaluate ln on the bit-identical double and "
        "divide by the same integer, so the sort keys are "
        "bit-identical; doc_id breaks impossible-in-practice ties). "
        "Complements corpus_pps_sample (systematic, needs a global "
        "cumsum window): A-ES is embarrassingly parallel — per-row "
        "key + ONE TakeOrdered top-k, no window, no total — the shape "
        "that wins when the corpus is unsorted and 100 TB wide. "
        "key_n9 is a display of the 1e-9-scaled key (round of "
        "identical doubles).",
    )
    def corpus_aes_weighted_sample(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pyspark.sql import Window

        docs = load_table(spark, "documents", sf_dir)
        keyed = docs.where(F.col("n_chars") > 0).select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            (
                F.log(
                    (
                        F.expr(h2l.replace("VARCHAR", "STRING"))
                        + F.lit(0.5)
                    )
                    / F.lit(4294967296.0)
                )
                / F.col("n_chars")
            ).alias("k"),
        )
        # TakeOrderedAndProject cuts to AES_K rows FIRST (no global
        # sort, no single-partition window over the corpus); the rank
        # window then runs on the 100-row result.
        top = keyed.orderBy(F.desc("k"), F.asc("doc_id")).limit(AES_K)
        w = Window.orderBy(F.desc("k"), F.asc("doc_id"))
        return top.select(
            F.row_number().over(w).cast("long").alias("rank"),
            "doc_id",
            "source",
            "n_chars",
            F.round(F.col("k") * 1e9).cast("long").alias("key_n9"),
        ).orderBy("rank")


_register_aes_sample()


# --- packing efficiency audit (fill rate, boundary splits) ------------------


@register(
    "corpus_packing_efficiency",
    oracle=f"""
WITH base AS (
  SELECT lang, doc_id, len({_TOKS_SQL}) AS n_tok FROM documents
),
cum AS (
  SELECT lang, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c
  FROM base
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(max(greatest(c - 1, 0) // {PACK_BUDGET}) + 1 AS BIGINT) AS n_seqs,
       CAST(sum(n_tok) * 1000000
            // ((max(greatest(c - 1, 0) // {PACK_BUDGET}) + 1) * {PACK_BUDGET})
         AS BIGINT) AS fill_u6,
       CAST(count(*) FILTER (
           n_tok > 0 AND (c - n_tok) // {PACK_BUDGET} <> (c - 1) // {PACK_BUDGET}
         ) AS BIGINT) AS n_split_docs
FROM cum
GROUP BY lang
ORDER BY lang
""",
    doc="Packing-efficiency audit of corpus_pack_greedy's concat-and-split "
    f"plan (budget {PACK_BUDGET} tokens): per language stream, the "
    "sequence count, the fill rate (tokens / capacity, exact 1e-6 "
    "integer units — only the final partial sequence leaves slack in "
    "the concat-split model), and the number of documents SPLIT across "
    "a sequence boundary (their start and end offsets land in "
    "different budget windows) — the two numbers a trainer cares "
    "about: wasted compute per batch, and how many examples lose "
    "context at a cut. Same single window shuffle on lang as the "
    "packer itself; the audit adds only integer arithmetic per row "
    "and a lang-domain agg. Exactness: cumulative offsets are BIGINT "
    "token counts; every division is integer. Degenerate guard (r6 "
    "ADVICE): a lang whose docs ALL tokenize to zero tokens has "
    "max(c-1) = -1, where Spark div truncates (0) but DuckDB // floors "
    "(-1) — greatest(c-1, 0) on both sides pins n_seqs=1/fill=0 for "
    "the empty stream and keeps the engines aligned.",
)
def corpus_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "lang", "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("c", F.sum("n_tok").over(w))
    split = (F.col("n_tok") > 0) & (
        F.expr(f"(c - n_tok) div {PACK_BUDGET}") != F.expr(f"(c - 1) div {PACK_BUDGET}")
    )
    return (
        cum.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            (F.max(F.expr(f"greatest(c - 1, 0L) div {PACK_BUDGET}")) + 1)
            .cast("long")
            .alias("n_seqs"),
            F.sum(F.when(split, 1).otherwise(0)).cast("long").alias("_n_split"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "n_seqs",
            F.expr(f"CAST(total_tokens * 1000000 div (n_seqs * {PACK_BUDGET}) AS BIGINT)").alias(
                "fill_u6"
            ),
            F.col("_n_split").alias("n_split_docs"),
        )
        .repartition("lang")  # bound the sort-sampler recompute (PERF.md r7, measured)
        .orderBy("lang")
    )


# --- token-mass concentration (Gini) per source ------------------------------


@register(
    "corpus_source_gini",
    oracle=f"""
WITH base AS (
  SELECT source, doc_id, len({_TOKS_SQL}) AS x FROM documents
),
ranked AS (
  SELECT source, x,
         row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS i
  FROM base
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(x) AS BIGINT) AS total_tokens,
       CAST((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000
            // (count(*) * sum(x)) AS BIGINT) AS gini_u6
FROM ranked
GROUP BY source
ORDER BY source
""",
    doc="Token-mass concentration (Gini coefficient) of documents within "
    "each source: 0 = every doc the same length, ->1 = a few giant "
    "docs carry the mass — the mixture diagnostic that tells a corpus "
    "builder whether a source's token budget is really spread across "
    "its documents or hiding in a handful (which skews packing, "
    "sampling, and dedup cost). Computed by the sorted-identity "
    "G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over docs ranked "
    "ascending by (tokens, doc_id) — every term exact BIGINT, emitted "
    "in 1e-6 units via integer division. Scale shape: one shuffle on "
    "source for the ranking window, then a source-domain agg; "
    "sum(i*x) <= n^2 * max_tok stays in int64 to ~100M docs/source x "
    "1k tokens — beyond that run the same identity in DECIMAL(38,0) "
    "partials (the two-step headroom rule).",
)
def corpus_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "source", "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("x")
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    ranked = base.withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("x").cast("long").alias("total_tokens"),
            F.sum(F.col("i") * F.col("x")).cast("long").alias("_ix"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr(
                "CAST((2 * _ix - (n_docs + 1) * total_tokens) * 1000000"
                " div (n_docs * total_tokens) AS BIGINT)"
            ).alias("gini_u6"),
        )
        .orderBy("source")
    )


# --- shard skew audit (straggler detection before training) ------------------


def _register_shard_skew_audit() -> None:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _hex2long

    oracle = f"""
WITH assigned AS (
  SELECT doc_id,
         {_hex2long("md5(CAST(doc_id AS VARCHAR))", 1)} % {N_SHARDS} AS shard,
         len({_TOKS_SQL}) AS n_tok
  FROM documents
),
per AS (
  SELECT shard, count(*) AS n_docs, sum(n_tok) AS toks
  FROM assigned GROUP BY shard
)
SELECT shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(toks AS BIGINT) AS shard_tokens,
       CAST(toks * 1000000 // (SELECT sum(toks) FROM per) AS BIGINT)
         AS token_share_u6,
       CAST(toks * {N_SHARDS} * 1000000 // (SELECT sum(toks) FROM per)
            - 1000000 AS BIGINT) AS skew_u6
FROM per
ORDER BY shard
"""

    @register(
        "corpus_shard_skew_audit",
        oracle=oracle,
        doc="Shard-skew audit of the corpus_shuffle_shards layout: per "
        "shard, the doc count, token mass, token share (1e-6 units), "
        "and the skew vs the ideal uniform share (share·N − 1, signed "
        "1e-6 units) — the straggler check a trainer runs BEFORE an "
        "epoch, because one hot shard sets the step time of every "
        "data-parallel worker (the same reason the engine salts "
        "skewed join keys). md5 assignment makes skew purely "
        "statistical; the audit turns that assumption into a measured "
        "number. Scale shape: one (shard) hash-agg with map-side "
        "partials — token counting is per-row codegen — then an "
        f"{N_SHARDS}-row domain close with a 1-row total broadcast. "
        "All integer; signed skew uses BIGINT division truncation "
        "identically on both engines only for non-negative shares, so "
        "the subtraction runs AFTER the non-negative division.",
    )
    def corpus_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, "documents", sf_dir)
        h = F.md5(F.col("doc_id").cast("string"))
        assigned = docs.select(
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_SHARDS).alias(
                "shard"
            ),
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok"),
        )
        per = assigned.groupBy("shard").agg(
            F.count("*").alias("n_docs"), F.sum("n_tok").alias("toks")
        )
        tot = per.agg(F.sum("toks").alias("tot"))
        return (
            per.join(F.broadcast(tot))
            .select(
                "shard",
                F.col("n_docs").cast("long").alias("n_docs"),
                F.col("toks").cast("long").alias("shard_tokens"),
                F.expr("CAST(toks * 1000000 div tot AS BIGINT)").alias(
                    "token_share_u6"
                ),
                F.expr(
                    f"CAST(toks * {N_SHARDS} * 1000000 div tot - 1000000 AS BIGINT)"
                ).alias("skew_u6"),
            )
            .orderBy("shard")
        )


_register_shard_skew_audit()


# --- crawl-growth dedup monitor (novelty over arrival order) ----------------

GROWTH_BATCH = 50  # docs per arrival batch (doc_id is the arrival order)


@register(
    "corpus_dedup_growth",
    oracle=f"""
WITH hashed AS (
  SELECT doc_id,
         doc_id // {GROWTH_BATCH} AS batch,
         min(doc_id) OVER (PARTITION BY md5(coalesce(text, ''))) AS first_id
  FROM documents
),
per_batch AS (
  SELECT batch,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) FILTER (doc_id = first_id) AS BIGINT) AS n_new
  FROM hashed GROUP BY batch
)
SELECT batch, n_docs, n_new,
       CAST((n_docs - n_new) * 1000000 // n_docs AS BIGINT) AS dup_rate_u6,
       CAST(sum(n_new) OVER (ORDER BY batch
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_distinct
FROM per_batch
ORDER BY batch
""",
    doc="Crawl-growth dedup monitor: treat doc_id as arrival order, cut "
    f"the stream into {GROWTH_BATCH}-doc batches, and report per batch "
    "how much is NEW — docs whose exact content hash (md5 of the "
    "NULL-coalesced text) was never seen in any earlier arrival — plus "
    "the duplicate rate (1e-6 integer units) and the cumulative "
    "distinct-content growth curve. The saturation diagnostic every "
    "continuously-crawled corpus needs: when cum_distinct flattens, "
    "additional crawl budget buys duplicates, not data (the "
    "exact-hash, over-time companion of corpus_ngram_novelty's "
    "cross-corpus check). Scale shape — hash ONCE into a narrow "
    "(doc_id, batch, hash) projection, eagerly checkpoint it (~40 "
    "bytes/doc — the text column is read exactly once and never "
    "shuffles), then TWO plain aggregations: per-batch doc counts, "
    "and min(doc_id) per content hash re-bucketed to its batch for "
    "the novelty counts; no window sort over the corpus, no "
    "self-join, batch-domain close. The r7 window form (min doc_id "
    "OVER hash partitions) was re-baked in r8 once the scan-floor "
    "receipt showed the text scan is 1-2% of runtime, not the 75% "
    "r7 measured cold: the exchange+SORT the window needs is the "
    "cost, and the agg form drops it — sf20 median-of-3 1.06 s vs "
    "3.87 s window, value-identical (DEDUP_GROWTH_AB_r8.json shows "
    "the md5->xxhash64 swap moves nothing on the Spark side: the "
    "hash was never the cost either). "
    "Exactness: md5 hex is engine-identical, everything else is "
    "BIGINT counts and one integer division per batch.",
)
def corpus_dedup_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    hashed = (
        docs.select(
            "doc_id",
            F.expr(f"doc_id div {GROWTH_BATCH}").alias("batch"),
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = hashed.groupBy("batch").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    n_new = (
        hashed.groupBy("h")
        .agg(F.min("doc_id").alias("first_id"))
        .select(F.expr(f"first_id div {GROWTH_BATCH}").alias("batch"))
        .groupBy("batch")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    per_batch = n_docs.join(n_new, "batch", "left").select(
        "batch",
        "n_docs",
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
    wb = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_batch.select(
            "batch",
            "n_docs",
            "n_new",
            F.expr("CAST((n_docs - n_new) * 1000000 div n_docs AS BIGINT)").alias(
                "dup_rate_u6"
            ),
            F.sum("n_new").over(wb).cast("long").alias("cum_distinct"),
        )
        .orderBy("batch")
    )


# --- budget-constrained source selection (fractional knapsack) --------------

MIX_BUDGET_PPM = 600_000  # spend 60% of the corpus's token mass


@register(
    "corpus_budget_mixture",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({_TOKS_SQL}) AS t FROM documents
),
per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(*) FILTER (t ~ '^[A-Za-z]+$') AS BIGINT) AS n_alpha
  FROM tok GROUP BY source
),
scored AS (
  SELECT source, n_tokens,
         CAST(n_alpha * 1000000 // n_tokens AS BIGINT) AS quality_u6
  FROM per_source
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY quality_u6 DESC, source) AS rnk,
         coalesce(sum(n_tokens) OVER (ORDER BY quality_u6 DESC, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev,
         (SELECT sum(n_tokens) * {MIX_BUDGET_PPM} // 1000000 FROM scored)
           AS budget
  FROM scored
)
SELECT source, n_tokens, quality_u6, CAST(rnk AS BIGINT) AS rnk,
       CAST(CASE
         WHEN cum_prev + n_tokens <= budget THEN 1000000
         WHEN cum_prev >= budget THEN 0
         ELSE (budget - cum_prev) * 1000000 // n_tokens
       END AS BIGINT) AS take_ppm
FROM ranked
ORDER BY rnk
""",
    doc="Budget-constrained source selection: rank sources by an exact "
    "quality score (alpha-token fraction, 1e-6 integer units — the "
    "boilerplate/noise discriminator of the ta_quality family), then "
    f"greedily spend a token budget ({MIX_BUDGET_PPM / 1e4:.0f}% of "
    "total corpus token mass) down the ranking: full take (1e6 ppm) "
    "while the budget lasts, an exact fractional take on the crossing "
    "source, zero after — the fractional-knapsack mixture a "
    "quality-first data recipe starts from before entropy/temperature "
    "smoothing (corpus_mix_temperature is the smoothed sibling). "
    "Deterministic: (quality, source) total order; every number is "
    "BIGINT token counts with integer division at the edges. Scale "
    "shape: one tokenize pass collapses the corpus to the source "
    "domain (map-side partials; the regexp runs inside the same "
    "projection), then ranking/prefix windows + the 1-row total on "
    "the tiny source table. Nothing corpus-sized crosses a second "
    "exchange.",
)
def corpus_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("t")
    )
    per_source = tok.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("t").rlike("^[A-Za-z]+$"), 1).otherwise(0))
        .cast("long")
        .alias("n_alpha"),
    )
    scored = per_source.select(
        "source",
        "n_tokens",
        F.expr("CAST(n_alpha * 1000000 div n_tokens AS BIGINT)").alias("quality_u6"),
    )
    total = scored.agg(
        F.expr(f"CAST(sum(n_tokens) * {MIX_BUDGET_PPM} div 1000000 AS BIGINT)").alias(
            "budget"
        )
    )
    wq = Window.orderBy(F.desc("quality_u6"), F.asc("source"))
    ranked = (
        scored.join(F.broadcast(total))
        .withColumn("rnk", F.row_number().over(wq).cast("long"))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("n_tokens").over(
                    wq.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    return ranked.select(
        "source",
        "n_tokens",
        "quality_u6",
        "rnk",
        F.expr(
            "CAST(CASE"
            " WHEN cum_prev + n_tokens <= budget THEN 1000000"
            " WHEN cum_prev >= budget THEN 0"
            " ELSE (budget - cum_prev) * 1000000 div n_tokens"
            " END AS BIGINT)"
        ).alias("take_ppm"),
    ).orderBy("rnk")
