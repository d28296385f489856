"""corpus_dedup_growth content-hash A/B (VERDICT r7 item 2).

The crawl-growth novelty contract needs any DETERMINISTIC content hash,
not a cryptographic one — first-occurrence marking is min(doc_id) per
hash partition, and the hash value itself is never emitted. This script
measures, at $SPARK_GRAFT_SF_DIR on both engines:

  - the registered md5 form vs a 64-bit fast-hash form
    (Spark xxhash64 vs DuckDB's native 64-bit hash()),
  - the raw text-scan floor (sum(length(text))) both engines,
  - and asserts the two Spark forms return IDENTICAL rows (the output
    is hash-free, so swapping the hash cannot change values).

Decision rule: if the fast-hash form pulls the ratio under 2x, switch
the registered query; if the ratio barely moves, the committed receipt
proves the gap is the text-scan floor and the scan-floor adjudication
stands with a measurement, not an argument.

Usage: SPARK_GRAFT_SF_DIR=testdata/sf20 python scripts/dedup_growth_ab.py
Writes DEDUP_GROWTH_AB_r8.json at the repo root.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import SF_DIR  # noqa: E402
from pyspark.sql import Window, functions as F  # noqa: E402

from mrc_spark_jobs_pubmed_spark.plans.corpus_queries import (  # noqa: E402
    GROWTH_BATCH,
)
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table  # noqa: E402


def _spark_form(spark, hash_col):
    docs = load_table(spark, "documents", SF_DIR)
    wh = Window.partitionBy(hash_col)
    hashed = docs.select(
        "doc_id",
        F.expr(f"doc_id div {GROWTH_BATCH}").alias("batch"),
        F.min("doc_id").over(wh).alias("first_id"),
    )
    per_batch = hashed.groupBy("batch").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("doc_id") == F.col("first_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
    )
    wb = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return per_batch.select(
        "batch",
        "n_docs",
        "n_new",
        F.expr("CAST((n_docs - n_new) * 1000000 div n_docs AS BIGINT)").alias(
            "dup_rate_u6"
        ),
        F.sum("n_new").over(wb).cast("long").alias("cum_distinct"),
    ).orderBy("batch")


def _duck_sql(hash_expr: str) -> str:
    return f"""
WITH hashed AS (
  SELECT doc_id,
         doc_id // {GROWTH_BATCH} AS batch,
         min(doc_id) OVER (PARTITION BY {hash_expr}) AS first_id
  FROM documents
),
per_batch AS (
  SELECT batch,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) FILTER (doc_id = first_id) AS BIGINT) AS n_new
  FROM hashed GROUP BY batch
)
SELECT batch, n_docs, n_new,
       CAST((n_docs - n_new) * 1000000 // n_docs AS BIGINT) AS dup_rate_u6,
       CAST(sum(n_new) OVER (ORDER BY batch
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_distinct
FROM per_batch
ORDER BY batch
"""


def _time_spark(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _time_duck(con, sql: str) -> float:
    con.execute(sql).fetchall()
    t0 = time.time()
    con.execute(sql).fetchall()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_session(
        app_name="dedup-growth-ab",
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )

    md5_col = F.md5(F.coalesce(F.col("text"), F.lit("")))
    xx_col = F.xxhash64(F.coalesce(F.col("text"), F.lit("")))

    # value identity: the output carries no hash values, so the two
    # forms must agree row-for-row (collision-free at this corpus size)
    rows_md5 = [tuple(r) for r in _spark_form(spark, md5_col).collect()]
    rows_xx = [tuple(r) for r in _spark_form(spark, xx_col).collect()]
    assert rows_md5 == rows_xx, "hash swap changed values — collision?"

    out = {
        "sf": float(re.search(r"sf([0-9.]+)", SF_DIR).group(1)),
        "rows_identical_md5_vs_xxhash64": True,
        "spark_md5_sec": _time_spark(_spark_form(spark, md5_col)),
        "spark_xxhash64_sec": _time_spark(_spark_form(spark, xx_col)),
        "duckdb_md5_sec": _time_duck(
            con, _duck_sql("md5(coalesce(text, ''))")
        ),
        "duckdb_hash_sec": _time_duck(con, _duck_sql("hash(coalesce(text, ''))")),
        "spark_text_scan_floor_sec": None,
        "duckdb_text_scan_floor_sec": None,
    }
    # raw text-scan floor: decode every text byte, nothing else
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
        "sum(length(text))"
    )
    df.collect()
    t0 = time.time()
    df.collect()
    out["spark_text_scan_floor_sec"] = round(time.time() - t0, 3)
    out["duckdb_text_scan_floor_sec"] = _time_duck(
        con, "SELECT sum(length(text)) FROM documents"
    )
    out["ratio_md5"] = round(out["spark_md5_sec"] / out["duckdb_md5_sec"], 2)
    out["ratio_fast_hash"] = round(
        out["spark_xxhash64_sec"] / out["duckdb_hash_sec"], 2
    )
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    with open(os.path.join(root, "DEDUP_GROWTH_AB_r8.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
