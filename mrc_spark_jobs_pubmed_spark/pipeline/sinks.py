"""Sinks: partitioned writes + idempotent resume.

Reference mechanisms replaced here:
* A4  blob-per-key uploads (job_pubmed_submit.py:21-28)   → partitioned
  parquet/csv writes with deterministic paths.
* A5  skip-if-exists guards (4 copies across the jobs)    → an anti-join
  of the work list against the sink's already-written keys — one
  declarative resume rule instead of a per-task HTTP existence check.
* A29 manual 5-chunk CSV splitting (word_count.py:85-103) → output
  partitioning (`repartition(n)`), which is what chunking was.
* A31 input!=output config guard (3 copies)               → validate().
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def validate(input_path: str, output_path: str) -> None:
    """A31: fail fast when a job would read and write the same path."""
    if os.path.abspath(input_path) == os.path.abspath(output_path):
        raise ValueError(
            f"input_path == output_path ({input_path!r}); refusing to overwrite input"
        )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "append",
    n_chunks: int | None = None,
) -> None:
    """Partitioned write; `n_chunks` reproduces A29's chunked output as
    output-file parallelism instead of driver-side list slicing."""
    if n_chunks:
        df = df.repartition(n_chunks)
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles ONCE at write time so every
    later equi-join/agg on `bucket_by` is exchange-free.

    This is the scale lever for repeatedly-joined fact tables (orders ⋈
    lineitem on orderkey at 100 TB): the shuffle is paid once at ingest,
    amortized over every downstream query. `sort_by` additionally makes
    those joins sort-merge-ready without a per-query sort.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def existing_keys(spark: SparkSession, path: str, key_col: str) -> DataFrame | None:
    """Distinct key values already present in a parquet sink (None if the
    sink doesn't exist yet)."""
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path).select(key_col).distinct()
    except Exception:  # empty/corrupt dir → treat as absent
        return None


def idempotent_write(
    df: DataFrame,
    spark: SparkSession,
    path: str,
    key_col: str,
    partition_by: tuple[str, ...] = (),
) -> int:
    """A5 as dataflow: append only rows whose key is not in the sink.

    Returns the number of rows written. Works at any scale: the done-key
    set is a column-pruned parquet scan, and the anti-join broadcasts it
    when small. (In streaming the checkpoint subsumes this; for batch
    re-runs this is the resume semantics the reference implemented with
    per-blob existence checks.)
    """
    done = existing_keys(spark, path, key_col)
    fresh = df if done is None else df.join(done, key_col, "left_anti")
    n = fresh.count()
    if n:
        write_partitioned(fresh, path, partition_by, mode="append")
    return n
