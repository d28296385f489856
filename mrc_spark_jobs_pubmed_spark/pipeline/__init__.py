from mrc_spark_jobs_pubmed_spark.pipeline.ingest import (  # noqa: F401
    build_work_table,
    expand_pages,
    fetch_pages,
    mock_search,
    mock_fetcher,
)
from mrc_spark_jobs_pubmed_spark.pipeline.parse import parse_articles  # noqa: F401
from mrc_spark_jobs_pubmed_spark.pipeline.keywords import (  # noqa: F401
    keywords_v1,
    keywords_v2,
)
from mrc_spark_jobs_pubmed_spark.pipeline.sinks import (  # noqa: F401
    idempotent_write,
    write_partitioned,
)
from mrc_spark_jobs_pubmed_spark.pipeline.run import run_pipeline  # noqa: F401
