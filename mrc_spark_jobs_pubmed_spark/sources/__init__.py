from mrc_spark_jobs_pubmed_spark.sources.catalog import (  # noqa: F401
    TABLE_SCHEMAS,
    load_table,
    load_tables,
    register_views,
)
