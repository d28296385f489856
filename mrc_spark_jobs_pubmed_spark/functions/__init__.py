from mrc_spark_jobs_pubmed_spark.functions.stopwords import (  # noqa: F401
    CUSTOM_STOPWORDS,
    ENGLISH_STOPWORDS,
    STOPWORDS,
)
from mrc_spark_jobs_pubmed_spark.functions.text import (  # noqa: F401
    clean_text,
    distinct_tokens,
    keywords,
    lemma_sql,
    lemmatize_tokens,
    remove_stopwords,
    tokenize,
)
