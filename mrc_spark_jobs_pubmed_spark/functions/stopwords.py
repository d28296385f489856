"""Stopword data.

The reference uses NLTK's English stopword list plus 11 custom words
(spark-pubmed-word-count/word_count.py:32-35); keywords-v2 ships its own
226-word domain list as a module (extract-keywords-from-abstracts/
mrc_stopwords.py). The engine treats stopword lists as *data*: a default
English list below (standard public-domain stopwords), the reference's 11
custom additions, and any caller-supplied list, distributed to executors as
an array literal / broadcast — never captured ad hoc in a closure (the
reference broadcast a handle it then never used, extract_keywords_from_all_
abstracts.py:39 — bug B3 in SURVEY.md §3.4).
"""

from __future__ import annotations

# A standard English stopword list (function words). Kept sorted for
# deterministic plans and reproducible oracle SQL.
ENGLISH_STOPWORDS: tuple[str, ...] = tuple(
    sorted(
        """
    a about above after again against all am an and any are aren as at be
    because been before being below between both but by can cannot could
    couldn did didn do does doesn doing don down during each few for from
    further had hadn has hasn have haven having he her here hers herself him
    himself his how i if in into is isn it its itself just me mightn more
    most mustn my myself needn no nor not now o of off on once only or other
    our ours ourselves out over own re s same shan she should shouldn so
    some such t than that the their theirs them themselves then there these
    they this those through to too under until up very was wasn we were
    weren what when where which while who whom why will with won would
    wouldn you your yours yourself yourselves
    """.split()
    )
)

# The reference's 11 custom stopwords (word_count.py:33) — domain data, kept
# for output parity with the v1 keywords job.
CUSTOM_STOPWORDS: tuple[str, ...] = (
    "using",
    "show",
    "result",
    "large",
    "also",
    "iv",
    "one",
    "two",
    "new",
    "previously",
    "shown",
)

STOPWORDS: tuple[str, ...] = tuple(sorted(set(ENGLISH_STOPWORDS) | set(CUSTOM_STOPWORDS)))
