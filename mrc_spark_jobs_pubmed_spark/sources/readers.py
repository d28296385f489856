"""Schema-explicit readers beyond parquet (SURVEY.md §2 Part B scans).

Generalizes the reference's ad-hoc input handling: driver-side blob
listing (A6, job_pubmed_jsons.py:45-52) becomes glob paths resolved by
Spark's own file index, and whole-file text download (A7,
extract_keywords_from_all_abstracts.py:88-89) becomes `wholetext` reads
with `input_file_name()` lineage. Schema is always declared — inference
is a full scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """NDJSON reader (A9's native form — one JSON object per line)."""
    return spark.read.schema(schema).json(path)


def read_text(
    spark: SparkSession, path: str, wholetext: bool = False, with_lineage: bool = True
) -> DataFrame:
    """Line- or whole-file text read (A7); `source_file` recovers the
    per-file lineage the reference encoded in blob names (A12)."""
    df = spark.read.text(path, wholetext=wholetext)
    if with_lineage:
        df = df.withColumn("source_file", F.input_file_name())
    return df


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC reader — the other columnar format with pushdown + pruning;
    schema declared, same as every reader here."""
    return spark.read.schema(schema).orc(path)
