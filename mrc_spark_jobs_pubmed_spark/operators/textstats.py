"""Text-analysis operators: language-ID, quality scoring, token counting,
fingerprinting (SURVEY.md §2 Part B / north-star text analysis).

Every operator is a pure Column expression with a generated DuckDB SQL
mirror — per-row arithmetic only (ratios = integer divisions, IEEE-
deterministic), so no rounding is needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.functions.stopwords import ENGLISH_STOPWORDS

# --- language ID (n-gram/marker heuristic) ---------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "that", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
}
LANG_ORDER = tuple(LANG_MARKERS)  # tie-break: earlier wins


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def marker_hits_sql(toks_expr: str, markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({toks_expr}, t -> t IN ({in_list})))"


def predicted_lang(scores: dict[str, Column]) -> Column:
    """Argmax over marker-hit scores with LANG_ORDER tie-break."""
    langs = list(LANG_ORDER)
    expr = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
    return expr.otherwise(F.lit(langs[-1]))


def predicted_lang_sql(score_exprs: dict[str, str]) -> str:
    langs = list(LANG_ORDER)
    parts = ["CASE"]
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"{score_exprs[lang]} >= {score_exprs[o]}" for o in langs[i + 1 :]
        )
        parts.append(f"WHEN {conds} THEN '{lang}'")
    parts.append(f"ELSE '{langs[-1]}' END")
    return " ".join(parts)


# --- quality scoring -------------------------------------------------------

_STOP_IN = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)


def quality_columns(toks: Column, text: Column) -> dict[str, Column]:
    """Per-doc quality signals: counts and ratios (all int-division →
    engine-deterministic doubles)."""
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*ENGLISH_STOPWORDS)))
    n_distinct = F.size(F.array_distinct(toks))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return {
        "n_chars": F.length(text),
        "n_tokens": n_tok,
        "stopword_ratio": n_stop.cast("double") / n_tok,
        "distinct_ratio": n_distinct.cast("double") / n_tok,
        "avg_token_len": total_len.cast("double") / n_tok,
    }


def quality_columns_sql(toks_expr: str, text_expr: str) -> dict[str, str]:
    n_tok = f"len({toks_expr})"
    return {
        "n_chars": f"length({text_expr})",
        "n_tokens": n_tok,
        "stopword_ratio": (
            f"CAST(len(list_filter({toks_expr}, t -> t IN ({_STOP_IN}))) AS DOUBLE)"
            f" / {n_tok}"
        ),
        "distinct_ratio": f"CAST(len(list_distinct({toks_expr})) AS DOUBLE) / {n_tok}",
        "avg_token_len": (
            f"CAST(list_sum(list_transform({toks_expr}, t -> length(t))) AS DOUBLE)"
            f" / {n_tok}"
        ),
    }


# --- BPE-ish token counting ------------------------------------------------

# word pieces | digit runs | single non-space symbols — a regex stand-in
# for subword tokenization, countable without any Python UDF.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


def bpe_token_count_sql(text_expr: str) -> str:
    return f"len(regexp_extract_all({text_expr}, '{BPE_PATTERN}'))"


# --- fingerprinting --------------------------------------------------------


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed lowercase normalization before hashing."""
    return F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")


def normalized_text_sql(text_expr: str) -> str:
    return f"regexp_replace(lower(trim({text_expr})), '\\s+', ' ', 'g')"


def fingerprint(text: Column) -> Column:
    """64-bit-equivalent doc fingerprint: first 16 hex of sha256 of the
    normalized text (cross-engine stable, unlike xxhash64)."""
    return F.substring(F.sha2(normalized_text(text), 256), 1, 16)


def fingerprint_sql(text_expr: str) -> str:
    return f"substr(sha256({normalized_text_sql(text_expr)}), 1, 16)"
