"""Text pipeline as native Catalyst column expressions.

The reference runs its entire text pipeline inside opaque Python closures
per file (word_count.py:41-65): regex cleans, lowercase, split, stopword
set-difference, per-abstract dedup, lemmatize. Here each step is a
composable ``Column`` expression — JVM-side, whole-stage-codegen'd,
pushdown-friendly — mirroring SURVEY.md §2 A13-A25.

Lemmatization (A20/A21) is the one step with no Spark built-in. The engine
ships a rule-table noun lemmatizer defined ONCE as data (`LEMMA_IRREGULAR`
+ `LEMMA_SUFFIX_RULES`) and compiled two ways:

* `lemmatize_token_col()` — a Spark ``Column`` (CASE WHEN chain), so the
  hot path never crosses into Python; and
* `lemma_sql()` — the equivalent ANSI-SQL CASE expression, so the DuckDB
  correctness oracle runs the *same* rules.

When NLTK is installed, `lemmatize_tokens(..., use_nltk=True)` swaps in a
WordNet pandas_udf behind the same interface (Arrow-batched, never
row-at-a-time). Rule coverage targets the reference's golden example
(spark-pubmed-word-count/README.md:4-15: publications→publication,
men→man) plus common English noun suffixes; divergence from full WordNet
is documented, deliberate, and oracle-consistent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.functions.stopwords import STOPWORDS

# --- cleaning (A13-A16) ----------------------------------------------------

# (pattern, replacement) applied in the reference's order. After the first
# pass only [a-zA-Z ] remains, so the HTML-entity pass is a no-op kept for
# pipeline-shape parity (word_count.py:52-58).
CLEAN_PASSES: tuple[tuple[str, str], ...] = (
    ("[^a-zA-Z]", " "),
    ("&lt;/?.*?&gt;", " &lt;&gt; "),
    ("(\\d|\\W)+", " "),
)


def clean_text(col: Column) -> Column:
    """Strip punctuation/digits, lowercase — A13, A14, A15, A16."""
    out = F.regexp_replace(col, CLEAN_PASSES[0][0], CLEAN_PASSES[0][1])
    out = F.lower(out)
    for pat, repl in CLEAN_PASSES[1:]:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def clean_text_sql(expr: str) -> str:
    """DuckDB SQL mirror of `clean_text` (DuckDB needs the 'g' flag)."""
    out = f"regexp_replace({expr}, '[^a-zA-Z]', ' ', 'g')"
    out = f"lower({out})"
    out = f"regexp_replace({out}, '&lt;/?.*?&gt;', ' &lt;&gt; ', 'g')"
    out = f"regexp_replace({out}, '(\\d|\\W)+', ' ', 'g')"
    return f"trim({out})"


# --- tokenize (A17) --------------------------------------------------------


def tokenize(col: Column) -> Column:
    """Whitespace tokenizer → array<string>, empty tokens dropped."""
    return F.filter(F.split(col, "\\s+"), lambda w: F.length(w) > 0)


# --- stopwords (A23) / dedup (A24) ----------------------------------------


def remove_stopwords(col: Column, stopwords: Sequence[str] = STOPWORDS) -> Column:
    """Set-difference against the stopword list.

    `array_except` also deduplicates, matching the reference's Python-set
    semantics (word_count.py:61). The list travels as an array literal —
    Catalyst constant, shipped once per plan, not per closure.
    """
    return F.array_except(col, F.array(*[F.lit(w) for w in stopwords]))


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(col)


# --- lemmatizer (A20/A21): one rule table, two backends --------------------

# Irregular plurals (noun-default, as the reference's v1 lemmatizer).
LEMMA_IRREGULAR: tuple[tuple[str, str], ...] = (
    ("men", "man"),
    ("women", "woman"),
    ("children", "child"),
    ("feet", "foot"),
    ("teeth", "tooth"),
    ("mice", "mouse"),
    ("geese", "goose"),
    ("lives", "life"),
    ("wives", "wife"),
    ("knives", "knife"),
)

# Words ending in s that ARE lemmas — never stripped.
LEMMA_KEEP: tuple[str, ...] = (
    "series",
    "species",
    "diabetes",
    "news",
    "lens",
    "analysis",
    "basis",
    "thesis",
    "crisis",
    "virus",
)

# Ordered suffix rules: (match_regex, strip_regex, replacement, min_len).
LEMMA_SUFFIX_RULES: tuple[tuple[str, str, str, int], ...] = (
    ("ies$", "ies$", "y", 5),  # studies → study
    ("sses$", "es$", "", 5),  # classes → class
    ("(sh|ch|x|z)es$", "es$", "", 5),  # branches → branch, boxes → box
    ("[^su]s$", "s$", "", 4),  # publications → publication; keeps -ss/-us
)


def lemmatize_token_col(tok: Column) -> Column:
    """Compile the rule table to a Catalyst CASE WHEN chain over one token."""
    expr = None
    for plural, singular in LEMMA_IRREGULAR:
        cond = tok == F.lit(plural)
        expr = F.when(cond, F.lit(singular)) if expr is None else expr.when(cond, F.lit(singular))
    keep = tok.isin(*LEMMA_KEEP)
    expr = expr.when(keep, tok)
    for match, strip, repl, min_len in LEMMA_SUFFIX_RULES:
        cond = tok.rlike(match) & (F.length(tok) >= min_len)
        expr = expr.when(cond, F.regexp_replace(tok, strip, repl))
    return expr.otherwise(tok)


def lemma_sql(expr: str) -> str:
    """The SAME rule table as ANSI SQL (DuckDB oracle mirror)."""
    parts = ["CASE"]
    for plural, singular in LEMMA_IRREGULAR:
        parts.append(f"WHEN {expr} = '{plural}' THEN '{singular}'")
    keep_list = ", ".join(f"'{w}'" for w in LEMMA_KEEP)
    parts.append(f"WHEN {expr} IN ({keep_list}) THEN {expr}")
    for match, strip, repl, min_len in LEMMA_SUFFIX_RULES:
        parts.append(
            f"WHEN regexp_matches({expr}, '{match}') AND length({expr}) >= {min_len} "
            f"THEN regexp_replace({expr}, '{strip}', '{repl}')"
        )
    parts.append(f"ELSE {expr} END")
    return " ".join(parts)


def lemmatize_tokens(col: Column, use_nltk: bool = False) -> Column:
    """Lemmatize an array<string> column, noun-default (A20).

    Default backend is the pure-Column rule table (JVM-side, codegen).
    `use_nltk=True` switches to a WordNet pandas_udf when nltk is present —
    the vectorized seam the reference needed but ran row-at-a-time with a
    per-task corpus download (word_count.py:70-71, bug B6).
    """
    if use_nltk:
        return _nltk_lemmatize_udf()(col)
    return F.transform(col, lemmatize_token_col)


def _nltk_lemmatize_udf():
    import pandas as pd  # noqa: F401

    try:
        from nltk.stem import WordNetLemmatizer
    except ImportError as exc:  # pragma: no cover - nltk absent in this env
        raise ImportError("nltk not installed; use the rule-table backend") from exc

    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _lemmatize(s: pd.Series) -> pd.Series:  # pragma: no cover
        lem = WordNetLemmatizer()
        return s.map(lambda toks: [lem.lemmatize(t) for t in toks] if toks is not None else None)

    return _lemmatize


# --- composite: the reference keyword pipeline -----------------------------


def keywords(
    col: Column, stopwords: Sequence[str] = STOPWORDS, lemmatize: bool = True
) -> Column:
    """abstract text → array of distinct, cleaned, non-stopword lemmas.

    The whole v1 pipeline (word_count.py:41-65) as one Column expression:
    clean → tokenize → stopword-diff → lemmatize → distinct.
    """
    toks = remove_stopwords(tokenize(clean_text(col)), stopwords)
    if lemmatize:
        toks = lemmatize_tokens(toks)
    return distinct_tokens(toks)


def keywords_sql(expr: str, stopwords: Sequence[str] = STOPWORDS) -> tuple[str, str]:
    """DuckDB mirror pieces for the keyword pipeline.

    Returns (tokens_expr, stopword_in_list): the caller unnests
    ``tokens_expr``, filters ``word NOT IN (list)`` and ``word <> ''``,
    applies `lemma_sql`, then DISTINCTs — SQL's long-format equivalent of
    the array pipeline.
    """
    tokens = f"string_split_regex({clean_text_sql(expr)}, '\\s+')"
    in_list = ", ".join(f"'{w}'" for w in stopwords)
    return tokens, in_list
