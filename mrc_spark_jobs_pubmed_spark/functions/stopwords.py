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

# The keywords-v2 domain stopword list — reference data, shipped verbatim
# for v2 output parity (extract-keywords-from-abstracts/mrc_stopwords.py:
# 1-226: NLTK English list + single letters + domain words like
# 'indicator', 'technique', 'whereas', plus tokenizer artifacts "'nt",
# "'s"). Kept in the reference's own order; treat as data, not code.
MRC_STOPWORDS: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "against", "ain", "all",
    "also", "am", "an", "and", "any", "are", "aren", "aren't", "as", "at",
    "b", "be", "because", "been", "before", "being", "below", "between",
    "both", "but", "by", "c", "can", "could", "couldn", "couldn't", "d",
    "did", "didn", "didn't", "do", "does", "doesn", "doesn't", "doing",
    "don", "don't", "down", "during", "e", "each", "f", "few", "for",
    "from", "further", "g", "h", "had", "hadn", "hadn't", "has", "hasn",
    "hasn't", "have", "haven", "haven't", "having", "he", "hence", "her",
    "here", "hers", "herself", "him", "himself", "his", "how", "i", "if",
    "in", "indicator", "into", "is", "isn", "isn't", "it", "it's", "its",
    "itself", "iv", "j", "just", "large", "k", "l", "ll", "m", "ma",
    "many", "me", "mightn", "mightn't", "more", "most", "much", "mustn",
    "mustn't", "my", "myself", "n", "needn", "needn't", "new", "no",
    "nor", "not", "now", "o", "of", "off", "on", "once", "one", "only",
    "or", "other", "our", "ours", "ourselves", "out", "over", "own", "p",
    "previously", "q", "r", "re", "result", "s", "same", "shan",
    "shan't", "she", "she's", "should", "should've", "shouldn",
    "shouldn't", "show", "shown", "so", "some", "stand", "such", "t",
    "technique", "th", "than", "that", "that'll", "the", "their",
    "theirs", "them", "themselves", "then", "there", "these", "they",
    "this", "those", "through", "to", "too", "two", "type", "u", "under",
    "until", "up", "use", "used", "using", "v", "ve", "very", "w", "was",
    "wasn", "wasn't", "we", "were", "weren", "weren't", "what", "when",
    "where", "whereas", "which", "while", "who", "whom", "why", "will",
    "with", "won", "won't", "would", "wouldn", "wouldn't", "x", "y",
    "you", "you'd", "you'll", "you're", "you've", "your", "yours",
    "yourself", "yourselves", "z", "'nt", "'s", "'nt'",
)
