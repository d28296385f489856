"""PySpark-native analytics engine re-expressing the capabilities of the
reference ETL pipeline (ATL64/MrC-spark-jobs-pubmed) as a DataFrame-first,
Catalyst-optimized engine, plus the relational / dedup / similarity /
text-analysis / streaming surface a large-scale training-data pipeline needs.

Design rules (see SURVEY.md §1.4, §4):
- DataFrame/SQL only; RDDs are never exposed.
- Every filter/projection is a Catalyst expression (pushdown + pruning free).
- Python is crossed only at declared Arrow-batched pandas_udf seams.
- Operators are written for 100 TB scale: broadcast small dims, partial
  aggregation, no driver-side loops, AQE-friendly plans.
"""

__version__ = "0.1.0"

from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: F401
