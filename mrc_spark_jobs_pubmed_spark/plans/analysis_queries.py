"""Text-analysis queries over `documents` (operators in
mrc_spark_jobs_pubmed_spark.operators.textstats)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators import textstats as X
from mrc_spark_jobs_pubmed_spark.operators.dedup import tokens_col, tokens_sql
from mrc_spark_jobs_pubmed_spark.plans.registry import register
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

_TOKS_SQL = tokens_sql("text")


def _score_exprs_sql() -> dict[str, str]:
    return {
        lang: X.marker_hits_sql("toks", markers)
        for lang, markers in X.LANG_MARKERS.items()
    }


@register(
    "ta_langid",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang,
       {X.marker_hits_sql('toks', X.LANG_MARKERS['en'])} AS score_en,
       {X.marker_hits_sql('toks', X.LANG_MARKERS['de'])} AS score_de,
       {X.marker_hits_sql('toks', X.LANG_MARKERS['fr'])} AS score_fr,
       {X.predicted_lang_sql(_score_exprs_sql())} AS predicted_lang
FROM (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents)
""",
    doc="Language-ID heuristic: per-language marker-token hit counts with "
    "deterministic argmax. (The fixture's text is synthetic same-vocab "
    "soup, so the labeled lang column is not recoverable — the operator "
    "contract is the deterministic scoring itself.)",
)
def ta_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select("doc_id", F.col("lang").alias("labeled_lang"), tokens_col(F.col("text")).alias("toks"))
    scores = {
        lang: X.marker_hits(F.col("toks"), markers)
        for lang, markers in X.LANG_MARKERS.items()
    }
    return base.select(
        "doc_id",
        "labeled_lang",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        X.predicted_lang(scores).alias("predicted_lang"),
    )


@register(
    "ta_quality",
    oracle=f"""
SELECT doc_id,
       {X.quality_columns_sql('toks', 'text')['n_chars']} AS n_chars,
       {X.quality_columns_sql('toks', 'text')['n_tokens']} AS n_tokens,
       {X.quality_columns_sql('toks', 'text')['stopword_ratio']} AS stopword_ratio,
       {X.quality_columns_sql('toks', 'text')['distinct_ratio']} AS distinct_ratio,
       {X.quality_columns_sql('toks', 'text')['avg_token_len']} AS avg_token_len
FROM (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
""",
    doc="Quality signals per doc: char/token counts, stopword ratio, "
    "distinct-token ratio, mean token length — all integer-division "
    "doubles, bit-identical across engines.",
)
def ta_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select("doc_id", "text", tokens_col(F.col("text")).alias("toks"))
    cols = X.quality_columns(F.col("toks"), F.col("text"))
    return base.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@register(
    "ta_token_counts",
    oracle=f"""
SELECT doc_id,
       len({_TOKS_SQL}) AS ws_tokens,
       {X.bpe_token_count_sql('text')} AS bpe_tokens
FROM documents
""",
    doc="Token counting two ways: whitespace tokens and a BPE-ish regex "
    "(word pieces | digit runs | symbols) via regexp_extract_all — the "
    "pre-tokenizer count an LLM-pipeline budgets with.",
)
def ta_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("ws_tokens"),
        X.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


@register(
    "ta_fingerprint",
    oracle=f"""
SELECT doc_id,
       {X.fingerprint_sql('text')} AS fingerprint,
       md5({X.normalized_text_sql('text')}) AS md5_full
FROM documents
""",
    doc="Document fingerprinting: normalized (lower + whitespace-collapse) "
    "sha256 prefix + full md5 — cross-engine-stable content identity for "
    "incremental dedup joins.",
)
def ta_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fingerprint"),
        F.md5(X.normalized_text(F.col("text"))).alias("md5_full"),
    )


# --- character-entropy quality signal ---------------------------------------


@register(
    "ta_char_entropy",
    oracle="""
WITH chars AS (
  SELECT doc_id, t.ch AS ch
  FROM (SELECT doc_id,
               list_filter(string_split(text, ''), c -> c <> '') AS cs
        FROM documents),
       unnest(cs) AS t(ch)
),
freqs AS (
  SELECT doc_id, ch, count(*) AS n FROM chars GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       -- per-character terms rounded to exact 1e-9-unit BIGINTs before
       -- summing (order-independent; each -p*log2(p) >= 0), then the
       -- 6-dp value closes with pure integer half-up division — no
       -- round() of any engine-accumulated double
       ((sum(CAST(round(-(n::DOUBLE / tot) * ln(n::DOUBLE / tot) / ln(2)
                        * 1000000000) AS BIGINT)) + 500) // 1000)
         / 1000000.0 AS entropy_bits
FROM (SELECT doc_id, ch, n, sum(n) OVER (PARTITION BY doc_id) AS tot FROM freqs)
GROUP BY doc_id
""",
    doc="Per-document character-level Shannon entropy (bits/char) with "
    "character counts — the classic gibberish/boilerplate quality "
    "signal (low entropy = repeated filler, high = encoded noise). "
    "Scale shape: the char explode never shuffles raw characters — "
    "the (doc_id, char) hash-agg's map-side partial collapses each "
    "doc to its ≤|alphabet| distinct-char counts before the exchange, "
    "and the per-doc total + final entropy agg both reuse the same "
    "doc_id partitioning (window + agg, no extra exchange). Entropy "
    "uses ln(p)/ln(2) (IEEE-identical on both engines) with each term "
    "rounded to an exact 1e-9-unit integer before summing — the "
    "aggregate is order-independent and the 6-dp close is integer "
    "division, not a round() of an accumulated double.",
)
def ta_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    freqs = (
        # both engines split '' into [''] — drop the phantom empty char so
        # an empty doc contributes no rows instead of one '' char
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", ""), lambda c: c != F.lit(""))
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("doc_id"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        freqs.withColumn("tot", tot)
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_chars"),
            F.count("*").cast("long").alias("n_distinct_chars"),
            # exact-integer entropy: each per-char term rounds to a
            # 1e-9-unit BIGINT (non-negative) before the sum, so the
            # aggregate is order-independent; the 6-dp close is integer
            # half-up division, never round() of an accumulated double
            F.sum(
                F.round(-p * F.log(p) / F.log(F.lit(2.0)) * 1e9).cast("long")
            ).alias("_e9"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct_chars",
            (F.expr("(_e9 + 500) div 1000").cast("double") / 1e6).alias(
                "entropy_bits"
            ),
        )
    )


# --- readability scoring -----------------------------------------------------


@register(
    "ta_readability",
    oracle="""
WITH counts AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE len(regexp_extract_all(text, '\\S+')) END AS n_words,
         CASE WHEN text IS NULL THEN NULL
              ELSE len(regexp_extract_all(text, '[.!?]+')) END AS n_sentences,
         CASE WHEN text IS NULL THEN NULL
              ELSE len(regexp_extract_all(lower(text), '[aeiouy]+')) END
           AS n_syllables
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(206.835
             - 1.015 * (n_words::DOUBLE / greatest(n_sentences, 1))
             - 84.6 * (n_syllables::DOUBLE / greatest(n_words, 1)), 4)
         AS flesch
FROM counts
""",
    doc="Flesch reading-ease readability per doc from three codegen'd "
    "regexp counts: words (non-space runs), sentences ([.!?]+ runs, "
    "floored at 1), syllable proxy (vowel-group runs). The standard "
    "fluency/complexity quality gate a corpus build runs beside "
    "stopword/entropy signals. Zero shuffle — embarrassingly parallel "
    "per row, scales linearly with splits. NULL text => NULL counts "
    "and NULL score (unknown, never a fabricated zero); empty text "
    "scores as zero words over the 1-sentence floor.",
)
def ta_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    text = F.col("text")

    def runs(pattern: str, src=None) -> F.Column:
        src_col = text if src is None else src
        return F.when(
            text.isNotNull(),
            F.size(F.regexp_extract_all(src_col, F.lit(pattern), F.lit(0))),
        ).cast("long")

    n_words = runs(r"\S+")
    n_sentences = runs(r"[.!?]+")
    n_syllables = runs(r"[aeiouy]+", F.lower(text))
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.greatest(F.col("n_sentences"), F.lit(1))
    spw = F.col("n_syllables").cast("double") / F.greatest(F.col("n_words"), F.lit(1))
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "flesch"
        ),
    )


# --- winnowing fingerprints (MOSS) ------------------------------------------

WINNOW_W = 4  # consecutive k-gram hashes per winnow window


def _winnow_hash_sql() -> str:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _hex2long

    return _hex2long("md5(gram)", 1)


def _winnow_oracle() -> str:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import shingles_sql

    return f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
),
sh AS (
  SELECT doc_id, {shingles_sql('toks')} AS sh FROM toks
),
g AS (
  SELECT doc_id, r.i AS pos, sh[r.i] AS gram
  FROM sh, unnest(range(1, len(sh) + 1)) AS r(i)
),
h AS (
  SELECT doc_id, pos, {_winnow_hash_sql()} AS h FROM g
),
win AS (
  SELECT doc_id, pos, h,
         count(*) OVER (PARTITION BY doc_id) AS n,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS wmin
  FROM h
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_kgrams,
       CAST(count(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
       CAST(sum(DISTINCT wmin) AS BIGINT) AS fp_checksum
FROM win
WHERE pos <= n - {WINNOW_W} + 1 OR pos = 1
GROUP BY doc_id
"""


@register(
    "ta_winnow_fingerprint",
    oracle=_winnow_oracle(),
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, "
    "SIGMOD'03 — the MOSS algorithm): hash every word 3-gram, slide a "
    "4-hash window, keep each window's minimum; the selected set is a "
    "position-robust fingerprint with guaranteed match detection for "
    "any shared run >= w+k-1 tokens. Reported per doc as selected-set "
    "size + order-independent checksum. Winnowing is per-doc-local by "
    "definition, so the whole computation runs as array higher-order "
    "functions inside the row — ZERO shuffle, embarrassingly parallel "
    "over file splits (the first cut exploded shingles through a "
    "per-doc window: a corpus-sized exchange + in-partition sort that "
    "measured 27x DuckDB at sf1; this form is within noise of it). "
    "The md5 computes once per shingle (two-step transform — an inline "
    "hex-decode of md5(s) would re-hash 8x per element after lambda "
    "inlining). Docs with < k tokens have no k-grams and drop out (no "
    "fabricated fingerprints); docs shorter than one full window "
    "contribute their global min (clipped first frame), the standard "
    "short-doc winnow contract.",
)
def ta_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import SHINGLES_ARR_EXPR, _hex2long

    docs = load_table(spark, "documents", sf_dir)
    # Minima compare 8-char lowercase-hex prefixes directly (fixed-width
    # hex: lexicographic order == numeric order), so the integer decode
    # runs only over the SELECTED ~n/w fingerprints, not every shingle —
    # measured 15.1s -> 5.6s at sf1 (the full-decode form spent 4s
    # hex-decoding 10M shingles it would then throw away).
    # ps (the per-shingle hash-prefix array) is consumed by three
    # outputs + the empty filter; naive column reuse re-evaluates the
    # whole shingle+md5 transform per reference after CollapseProject
    # inlining (measured: 5.6s -> 10.4s at sf1). Binding it as a lambda
    # variable (transform over a 1-element wrapper) evaluates it once,
    # and the explode(array(struct)) generator is a pipeline breaker so
    # the struct's fields project without recompute.
    ps_expr = f"transform({SHINGLES_ARR_EXPR}, s -> substring(md5(s), 1, 8))"
    sel_expr = (
        f"array_distinct(transform(sequence(1, greatest(size(ps) - {WINNOW_W - 1}, 1)), "
        f"p -> array_min(slice(ps, p, {WINNOW_W}))))"
    )
    inner = (
        f"aggregate({sel_expr}, "
        "named_struct('n_kgrams', CAST(size(ps) AS BIGINT), "
        "'n_fp', CAST(0 AS BIGINT), 'ck', CAST(0 AS BIGINT)), "
        "(acc, m) -> named_struct('n_kgrams', acc.n_kgrams, "
        f"'n_fp', acc.n_fp + 1, 'ck', acc.ck + {_hex2long('m', 1)}))"
    )
    out_expr = f"transform(array({ps_expr}), ps -> {inner})[0]"
    o = (
        docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(F.array(F.expr(out_expr))).alias("o"))
    )
    return o.where(F.col("o.n_kgrams") > 0).select(
        "doc_id",
        F.col("o.n_kgrams").alias("n_kgrams"),
        F.col("o.n_fp").alias("n_fingerprints"),
        F.col("o.ck").alias("fp_checksum"),
    )


# --- Zipf's-law fit ----------------------------------------------------------

ZIPF_TOP = 1000  # fit over the top-N ranks (bounds the regression input)


@register(
    "ta_zipf_fit",
    oracle=f"""
WITH uni AS (
  SELECT t.tok AS tok, count(*) AS c
  FROM (SELECT {tokens_sql('text')} AS toks FROM documents), unnest(toks) AS t(tok)
  GROUP BY t.tok
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM uni
),
top AS (
  SELECT c FROM uni ORDER BY c DESC, tok LIMIT {ZIPF_TOP}
),
pts AS (
  SELECT CAST(round(ln(row_number() OVER (ORDER BY c DESC)) * 1e6) AS BIGINT) AS x,
         CAST(round(ln(c) * 1e6) AS BIGINT) AS y
  FROM top
),
sums AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(x * y) AS DOUBLE) AS sxy,
         CAST(sum(y * y) AS DOUBLE) AS syy
  FROM pts
)
SELECT n_types, n_tokens,
       CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n / 1e6, 6) AS zipf_intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r_squared
FROM sums CROSS JOIN corpus
""",
    doc="Zipf's-law fit: least-squares slope of ln(freq) vs ln(rank) "
    "over the top-1000 token ranks, with intercept and R² — the "
    "corpus-health diagnostic that flags template/boilerplate-heavy "
    "or truncated-vocabulary corpora (natural text sits near slope "
    "-1). Determinism: ln values are rounded to integer micro-units "
    "per term, so every regression sum is an exact BIGINT on any "
    "partitioning/engine; only the final closed-form arithmetic runs "
    "in doubles. Scale: the vocabulary agg is the usual map-side-"
    "partial hash-agg; the rank cap arrives via TakeOrderedAndProject "
    "(top-1000, never a global sort), and the regression itself is a "
    "1-row aggregate over 1000 points.",
)
def ta_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    uni = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    corpus = uni.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    top = uni.orderBy(F.desc("c"), F.asc("tok")).limit(ZIPF_TOP).select("c")
    rank = F.row_number().over(Window.orderBy(F.desc("c")))
    pts = top.select(
        F.round(F.log(rank.cast("double")) * 1e6).cast("long").alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long").alias("y"),
    )
    sums = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.crossJoin(F.broadcast(corpus)).select(
        "n_types",
        "n_tokens",
        n.cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n / F.lit(1e6), 6).alias("zipf_intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r_squared"),
    )


# --- tokenizer fertility -----------------------------------------------------

FERT_CHUNK = 4  # BPE-proxy subword width: a word of L chars -> ceil(L/4) tokens


@register(
    "ta_tokenizer_fertility",
    oracle=f"""
WITH words AS (
  SELECT d.doc_id, d.lang, strlen(d.text) AS n_bytes, t.tok AS tok
  FROM (SELECT doc_id, lang, text, {_TOKS_SQL} AS toklist FROM documents) d,
       unnest(d.toklist) AS t(tok)
),
per_doc AS (
  SELECT doc_id, lang,
         any_value(n_bytes) AS n_bytes,
         count(*) AS n_words,
         sum((length(tok) + {FERT_CHUNK - 1}) // {FERT_CHUNK}) AS n_subwords
  FROM words GROUP BY doc_id, lang
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
       CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
       CAST((sum(n_subwords) * 1000000) // sum(n_words) AS BIGINT)
         AS fertility_u6,
       CAST((sum(n_bytes) * 1000000) // sum(n_subwords) AS BIGINT)
         AS bytes_per_token_u6
FROM per_doc
GROUP BY lang
""",
    doc="Tokenizer fertility audit per language: subword tokens per "
    "word and bytes per token — the two numbers that decide whether a "
    "tokenizer taxes a language (high fertility = more sequence "
    "positions per sentence = less effective context and higher "
    "training cost for that language; the standard multilingual-"
    "tokenizer fairness check). The subword count uses the fixed-width "
    "BPE proxy ceil(len/{c}) — deterministic and engine-neutral; a "
    "trained tokenizer swaps in the text_bpe_encode machinery with the "
    "same aggregate contract. Ratios are exact integer 1e-6-unit "
    "divisions of exact sums. Scale shape: per-row tokenize + one "
    "(doc, lang) hash-agg then a |langs|-row rollup — map-side "
    "partials everywhere, output bounded by the language inventory "
    "at any corpus size.".format(c=FERT_CHUNK),
)
def ta_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "doc_id",
        "lang",
        F.octet_length("text").alias("n_bytes"),
        F.explode(tokens_col(F.col("text"))).alias("tok"),
    )
    per_doc = words.groupBy("doc_id", "lang").agg(
        F.first("n_bytes").alias("n_bytes"),
        F.count("*").alias("n_words"),
        F.sum(
            F.expr(f"(length(tok) + {FERT_CHUNK - 1}) div {FERT_CHUNK}")
        ).alias("n_subwords"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_subwords").cast("long").alias("n_subwords"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
        F.expr("CAST((sum(n_subwords) * 1000000) div sum(n_words) AS LONG)")
        .alias("fertility_u6"),
        F.expr(
            "CAST((sum(n_bytes) * 1000000) div sum(n_subwords) AS LONG)"
        ).alias("bytes_per_token_u6"),
    )


# --- lang-ID confusion matrix ------------------------------------------------


@register(
    "ta_langid_confusion",
    oracle=f"""
WITH scored AS (
  SELECT lang AS labeled_lang,
         {{pred}} AS predicted_lang
  FROM (SELECT lang, {_TOKS_SQL} AS toks FROM documents)
)
SELECT labeled_lang, predicted_lang,
       count(*) AS n_docs
FROM scored
GROUP BY labeled_lang, predicted_lang
""".format(pred=X.predicted_lang_sql(_score_exprs_sql())),
    doc="Language-ID confusion matrix: labeled vs predicted language "
    "counts — the AGGREGATE evaluation contract for the ta_langid "
    "heuristic (per-doc scores are the diagnostic form; the confusion "
    "matrix is what a corpus build actually monitors, and its "
    "|langs|^2-bounded output ships from any corpus size). Same "
    "deterministic marker-count argmax as ta_langid; one hash-agg "
    "with map-side partials over per-row scoring — zero joins, zero "
    "windows.",
)
def ta_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        F.col("lang").alias("labeled_lang"),
        tokens_col(F.col("text")).alias("toks"),
    )
    scores = {
        lang: X.marker_hits(F.col("toks"), markers)
        for lang, markers in X.LANG_MARKERS.items()
    }
    return (
        base.select(
            "labeled_lang", X.predicted_lang(scores).alias("predicted_lang")
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


# --- code-vs-prose detection -------------------------------------------------


@register(
    "ta_code_detection",
    oracle=f"""
SELECT doc_id,
       CAST(length(text) - length(regexp_replace(text, '[{{}};()=<>\\[\\]|&]', '', 'g'))
            AS BIGINT) AS n_code_chars,
       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS BIGINT) AS n_digits,
       CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN length(text) > 0 THEN
         ((length(text) - length(regexp_replace(text, '[{{}};()=<>\\[\\]|&]', '', 'g')))
          * 1000000) // length(text) ELSE 0 END AS BIGINT) AS code_ratio_u6,
       (length(text) > 0 AND
        ((length(text) - length(regexp_replace(text, '[{{}};()=<>\\[\\]|&]', '', 'g')))
         * 1000000) // length(text) >= 20000) AS looks_like_code
FROM documents
""",
    doc="Code-vs-prose detection: per-doc density of code-symbol "
    "characters (braces, semicolons, operators, brackets) and digits, "
    "with a 2%-density flag — the cheap first-pass router that keeps "
    "code out of prose training mixes (and vice versa) before an "
    "expensive classifier runs; code/prose balance is a first-order "
    "LLM data-mix decision. Ratios are exact 1e-6-unit integer "
    "divisions of exact character counts — no floats. Pure per-row "
    "regexp/length codegen, zero shuffle, output row-per-doc; at "
    "100 TB this is a free rider on any existing corpus scan.",
)
def ta_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    n_chars = F.length("text")
    code_chars = n_chars - F.length(
        F.regexp_replace("text", r"[{};()=<>\[\]|&]", "")
    )
    digits = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    ratio = F.when(n_chars > 0, F.expr(
        "((length(text) - length(regexp_replace(text,"
        " '[{};()=<>\\\\[\\\\]|&]', ''))) * 1000000) div length(text)"
    )).otherwise(F.lit(0))
    return docs.select(
        "doc_id",
        code_chars.cast("long").alias("n_code_chars"),
        digits.cast("long").alias("n_digits"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        ratio.cast("long").alias("code_ratio_u6"),
        ((n_chars > 0) & (ratio >= 20000)).alias("looks_like_code"),
    )


# --- charset / script profile -------------------------------------------------


@register(
    "ta_charset_profile",
    oracle=r"""
WITH per_doc AS (
  SELECT lang,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(regexp_replace(text, '[^ ]', '', 'g')) AS n_space,
         length(text)
           - length(regexp_replace(text, '[\x80-\x{10FFFF}]', '', 'g'))
           AS n_nonascii
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(n_alpha) * 1000000 // sum(n_chars) AS BIGINT) AS alpha_u6,
       CAST(sum(n_digit) * 1000000 // sum(n_chars) AS BIGINT) AS digit_u6,
       CAST(sum(n_space) * 1000000 // sum(n_chars) AS BIGINT) AS space_u6,
       CAST(sum(n_nonascii) * 1000000 // sum(n_chars) AS BIGINT)
         AS nonascii_u6
FROM per_doc
GROUP BY lang
ORDER BY lang
""",
    doc="Charset/script profile per language: corpus-level shares (1e-6 "
    "integer units) of ASCII letters, digits, spaces, and non-ASCII "
    "codepoints — the encoding-noise audit that catches mojibake, "
    "double-encoded UTF-8, and mislabeled languages BEFORE tokenizer "
    "training bakes them into the vocab (a non-ASCII share that "
    "disagrees with the language label is the classic crawl-pipeline "
    "smell). Counting is regexp_replace-strip length deltas — per-row "
    "codegen'd, zero shuffle until the |langs|-row agg; shares by "
    "integer division of summed counts, no per-doc float ratios to "
    "re-average wrongly (the ratio-of-sums vs sum-of-ratios trap). "
    "Character classes are codepoint-range based so both engines "
    "count identical quantities on identical UTF-8.",
)
def ta_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    per_doc = docs.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace("text", "[^ ]", "")).alias("n_space"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^\x00-\x7F]", ""))
        ).alias("n_nonascii"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_alpha").alias("_a"),
        F.sum("n_digit").alias("_d"),
        F.sum("n_space").alias("_s"),
        F.sum("n_nonascii").alias("_n"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_chars",
        F.expr("CAST(_a * 1000000 div n_chars AS BIGINT)").alias("alpha_u6"),
        F.expr("CAST(_d * 1000000 div n_chars AS BIGINT)").alias("digit_u6"),
        F.expr("CAST(_s * 1000000 div n_chars AS BIGINT)").alias("space_u6"),
        F.expr("CAST(_n * 1000000 div n_chars AS BIGINT)").alias(
            "nonascii_u6"
        ),
    ).orderBy("lang")


# --- bigram conditional entropy (predictability rate) per source -------------


@register(
    "ta_bigram_entropy",
    oracle="""
WITH bg AS (
  SELECT source, t.b AS b
  FROM (SELECT source,
               list_transform(range(1, length(text)), i -> substr(text, i, 2))
                 AS bs
        FROM documents),
       unnest(bs) AS t(b)
),
pair AS (
  SELECT source, b, count(*) AS c_xy FROM bg GROUP BY source, b
),
cond AS (
  SELECT source, b, c_xy,
         sum(c_xy) OVER (PARTITION BY source, substr(b, 1, 1)) AS c_x,
         sum(c_xy) OVER (PARTITION BY source) AS tot
  FROM pair
)
SELECT source,
       CAST(min(tot) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(sum(c_xy * CAST(round(
             ln(CAST(c_x AS DOUBLE) / CAST(c_xy AS DOUBLE)) * 1000000)
           AS BIGINT)) // min(tot) AS BIGINT) AS h_cond_u6
FROM cond
GROUP BY source
ORDER BY source
""",
    doc="Character-bigram conditional entropy H(next char | char) per "
    "source, in exact 1e-6-nat integer units — the predictability rate "
    "that separates natural prose (low, ~1-2 nats) from encoded or "
    "shuffled noise (high) and from templated boilerplate (very low); "
    "the sequential companion to ta_char_entropy's unigram signal. "
    "Exact-integer discipline (the unigram-LM pattern): each bigram's "
    "term is c_xy * round(ln(c_x/c_xy)*1e6) — ln of a ratio of exact "
    "BIGINTs, rounded per term BEFORE the sum — so the aggregate is "
    "order-independent and the close is one integer division by the "
    "bigram total. Scale shape: the bigram explode never shuffles raw "
    "text — the (source, bigram) hash-agg's map-side partial collapses "
    "each partition to <=|charset|^2 rows before the exchange; the "
    "conditional and total sums are windows over that bounded domain.",
)
def ta_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    pair = (
        docs.select(
            "source",
            # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) where
            # DuckDB's range(1, 1) is empty — a <2-char doc must emit
            # zero bigrams on both engines
            F.explode(
                F.expr(
                    "CASE WHEN length(text) >= 2 THEN "
                    "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2)) "
                    "ELSE CAST(array() AS array<string>) END"
                )
            ).alias("b"),
        )
        .groupBy("source", "b")
        .agg(F.count("*").alias("c_xy"))
    )
    wx = Window.partitionBy("source", F.substring("b", 1, 1))
    ws = Window.partitionBy("source")
    cond = pair.select(
        "source",
        "b",
        "c_xy",
        F.sum("c_xy").over(wx).alias("c_x"),
        F.sum("c_xy").over(ws).alias("tot"),
    )
    term = F.col("c_xy") * F.round(
        F.log(F.col("c_x").cast("double") / F.col("c_xy").cast("double")) * 1e6
    ).cast("long")
    return (
        cond.groupBy("source")
        .agg(
            F.min("tot").cast("long").alias("n_bigrams"),
            F.count("*").cast("long").alias("n_distinct_bigrams"),
            F.sum(term).alias("_t"),
        )
        .select(
            "source",
            "n_bigrams",
            "n_distinct_bigrams",
            F.expr("CAST(_t div n_bigrams AS BIGINT)").alias("h_cond_u6"),
        )
        .repartition("source")  # bound the sort-sampler recompute (PERF.md r7, measured)
        .orderBy("source")
    )


# --- vocabulary growth (Heaps' law) -----------------------------------------

HEAPS_BUCKETS = 10


@register(
    "ta_vocab_growth",
    oracle=f"""
WITH bounds AS (
  SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
),
d AS (
  SELECT doc_id,
         least({HEAPS_BUCKETS - 1},
               ((doc_id - lo) * {HEAPS_BUCKETS}) // (hi - lo + 1)) AS bucket,
         {_TOKS_SQL} AS toks
  FROM documents CROSS JOIN bounds
),
ex AS (SELECT bucket, unnest(toks) AS w FROM d),
tok_b AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok FROM ex GROUP BY bucket
),
firsts AS (
  SELECT w, min(bucket) AS first_bucket FROM ex GROUP BY w
),
new_b AS (
  SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY first_bucket
),
curve AS (
  SELECT t.bucket,
         CAST(sum(t.n_tok) OVER (ORDER BY t.bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY t.bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
  FROM tok_b t LEFT JOIN new_b n ON t.bucket = n.bucket
),
pts AS (
  SELECT CAST(round(ln(cum_tokens) * 1e6) AS BIGINT) AS x,
         CAST(round(ln(cum_types) * 1e6) AS BIGINT) AS y
  FROM curve
),
fit AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(x * y) AS DOUBLE) AS sxy
  FROM pts
)
SELECT bucket, cum_tokens, cum_types,
       round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6)
         AS heaps_beta,
       round(exp((sy - ((n * sxy - sx * sy)
                        / nullif(n * sxx - sx * sx, 0)) * sx)
             / n / 1e6), 6) AS heaps_k
FROM curve CROSS JOIN fit
ORDER BY bucket
""",
    doc=f"Vocabulary-growth curve + Heaps'-law fit: the corpus is cut "
    f"into {HEAPS_BUCKETS} doc-id range buckets (arrival-order proxy; "
    "no sort, no ntile — the bucket is closed-form from the broadcast "
    "min/max), and per prefix the curve reports cumulative tokens vs "
    "cumulative distinct vocabulary (a word counts at the bucket of "
    "its FIRST doc — one min-agg over the token explode, never a "
    "per-prefix rescan). The log-log OLS over the curve gives Heaps' "
    "V = K * n^beta — the tokenizer/vocab-sizing law (natural text: "
    "beta ~ 0.4-0.6; beta near 0 = saturated/templated vocabulary, "
    "near 1 = OCR noise or id soup), the companion diagnostic to "
    "ta_zipf_fit's frequency law and corpus_dedup_growth's doc-level "
    "novelty curve, at token level where tokenizer decisions live. "
    "Determinism: the curve is exact integers; ln values quantize to "
    "1e-6 units per point (the ta_zipf_fit contract) so the "
    "regression sums are exact BIGINTs and only the closed form runs "
    "in doubles. Scale shape: ONE corpus pass, literally — the "
    "per-bucket token count and the per-word first-bucket min share "
    "one GROUPING SETS aggregation over one explode (Expand doubles "
    "exploded rows, but scan+tokenize run once and the map-side "
    "partial bounds the shuffle at buckets + vocab domain), the "
    f"result re-groups to the {HEAPS_BUCKETS}-row curve which "
    "localCheckpoints (eager, tiny) so the OLS stitch cannot "
    "re-execute the corpus lineage; everything after is windows and "
    f"a broadcast stitch on <= {HEAPS_BUCKETS} rows.",
)
def ta_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    d = docs.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(HEAPS_BUCKETS - 1),
            F.expr(f"((doc_id - lo) * {HEAPS_BUCKETS}) div (hi - lo + 1)"),
        ).alias("bucket"),
        tokens_col(F.col("text")).alias("toks"),
    )
    # ONE corpus pass: per-bucket token totals (group set {bucket}) and
    # per-word first buckets (group set {w}) come out of a single
    # GROUPING SETS aggregation over a single explode — two separate
    # groupBys would each re-run the scan+tokenize lineage.
    ex = d.select("bucket", F.explode("toks").alias("w"))
    g = ex.groupingSets([["bucket"], ["w"]], "bucket", "w").agg(
        F.count("*").alias("n"),
        F.min("bucket").alias("mn"),
        F.grouping_id().alias("gid"),
    )
    combined = (
        g.groupBy(F.coalesce(F.col("bucket"), F.col("mn")).alias("bucket"))
        .agg(
            F.sum(F.when(F.col("gid") == 1, F.col("n")))
            .cast("long")
            .alias("n_tok"),
            F.sum(F.when(F.col("gid") == 2, 1)).cast("long").alias("n_new"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the curve is <= HEAPS_BUCKETS rows but its lineage is the corpus;
    # eager-checkpoint so the OLS fit + final stitch (two consumers)
    # cannot re-execute the tokenize pass (the connected_components /
    # minhash_recall rule).
    curve = (
        combined.select(
            "bucket",
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("cum_types"),
        )
        .localCheckpoint(eager=True)
    )
    pts = curve.select(
        F.round(F.log(F.col("cum_tokens")) * 1e6).cast("long").alias("x"),
        F.round(F.log(F.col("cum_types")) * 1e6).cast("long").alias("y"),
    )
    fit = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    # nullif'd denominator: a degenerate curve (every prefix identical —
    # e.g. a 1-doc corpus collapsing to one point) has zero x-variance;
    # the fit is undefined and must surface as NULL on BOTH engines, not
    # as Spark's ANSI DIVIDE_BY_ZERO abort (single-row fixture gate).
    den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    return (
        curve.crossJoin(F.broadcast(fit))
        .select(
            "bucket",
            "cum_tokens",
            "cum_types",
            F.round(beta, 6).alias("heaps_beta"),
            F.round(
                F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n") / 1e6), 6
            ).alias("heaps_k"),
        )
        .orderBy("bucket")
    )
