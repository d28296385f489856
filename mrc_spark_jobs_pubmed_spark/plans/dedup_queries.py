"""Dedup queries over `documents` — each dedup family as an oracle-checked
named query (operators in mrc_spark_jobs_pubmed_spark.operators.dedup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators import dedup as D
from mrc_spark_jobs_pubmed_spark.plans.registry import register
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table


@register(
    "dedup_exact",
    oracle=D.EXACT_DEDUP_SQL,
    doc="Exact dedup: sha256 content hash group-by with copy count and "
    "canonical (min) id. One shuffle on the hash at any scale.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(load_table(spark, "documents", sf_dir))


@register(
    "dedup_minhash_bands",
    oracle=D.minhash_band_keys_sql(),
    doc="MinHash signatures (16 hashes, 4 bands × 4 rows): (doc_id, "
    "band_id, band_key). Verifies the full shingle→minhash→band pipeline "
    "value-exactly; band_key equality drives LSH candidate generation.",
)
def dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return D.minhash_band_keys(D.shingle_rows(docs, distinct=False))


@register(
    "dedup_minhash_pairs",
    oracle=f"""
WITH bands AS ({D.minhash_band_keys_sql()})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
""",
    doc="LSH candidate pairs: bucket equi-join on band keys (never an "
    "all-pairs compare). Empty result on a dup-free corpus is the correct "
    "answer and is value-checked as such.",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return D.lsh_candidate_pairs(
        D.minhash_band_keys(D.shingle_rows(docs, distinct=False))
    )


@register(
    "dedup_jaccard_top_pairs",
    oracle=f"""
SELECT doc_a, doc_b, jaccard FROM ({D.JACCARD_PAIRS_SQL})
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 100
""",
    doc="n-gram (word 3-shingle) Jaccard: top-100 most-similar pairs via "
    "shingle equi-join — the exact verification stage behind MinHash "
    "candidates. Raw double division, deterministic both engines.",
)
def dedup_jaccard_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        D.jaccard_pairs(D.shingle_rows(docs))
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(100)
    )


@register(
    "dedup_simhash",
    oracle=D.simhash_fingerprints_sql(),
    doc="SimHash: 32-bit md5-derived fingerprint per doc as BIGINT — "
    "sign of summed ±1 bit contributions over distinct tokens. Single "
    "shuffle; near-dups differ in few bits (Hamming).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_fingerprints(load_table(spark, "documents", sf_dir))


@register(
    "dedup_cluster_components",
    oracle=f"""
WITH RECURSIVE {D.minhash_ctes_sql()},
pairs AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
cc AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, cc.label AS label
  FROM cc JOIN edges e ON e.a = cc.node
  WHERE cc.label < e.b
)
SELECT node AS doc_id, min(label) AS component FROM cc GROUP BY node
""",
    doc="Duplicate-cluster resolution: connected components over the LSH "
    "candidate graph (iterative min-label propagation, localCheckpoint "
    "per round) — canonical labels that survive chained near-dups where "
    "pairwise doc_b-dropping over-deletes. Oracle: DuckDB recursive CTE "
    "reaching the same fixpoint.",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    pairs = D.lsh_candidate_pairs(
        D.minhash_band_keys(D.shingle_rows(docs, distinct=False))
    ).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    return D.connected_components(docs, pairs)
