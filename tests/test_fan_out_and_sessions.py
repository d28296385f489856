"""Round-4 units: scan fan-out policy + the sessionization fold core."""

from __future__ import annotations

from mrc_spark_jobs_pubmed_spark.sources import catalog
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table
from mrc_spark_jobs_pubmed_spark.streaming.jobs import _GAP_US, fold_sessions

SF = "/root/testdata/sf0.001"


def test_documents_scan_fans_out_to_cluster_parallelism(spark, monkeypatch):
    # single-row-group fixture files are unsplittable — the corpus
    # tables must decouple pipeline parallelism from file layout once
    # the scan is big enough to amortize the shuffle
    monkeypatch.setattr(catalog, "FAN_OUT_MIN_BYTES", 0)
    monkeypatch.setattr(catalog, "_FAN_OUT_NEEDED", {})
    target = spark.sparkContext.defaultParallelism
    assert load_table(spark, "documents", SF).rdd.getNumPartitions() >= target
    assert load_table(spark, "embeddings", SF).rdd.getNumPartitions() >= target


def test_small_scans_skip_the_fan_out_shuffle(spark):
    # below FAN_OUT_MIN_BYTES the repartition costs more than the
    # single-threaded per-row work it parallelizes (measured on BM25 at
    # sf0.1) — the tiny fixture must NOT be repartitioned
    target = spark.sparkContext.defaultParallelism
    assert load_table(spark, "documents", SF).rdd.getNumPartitions() < target


def test_relational_scans_are_not_fanned_out(spark, monkeypatch):
    # cheap-per-row scans must NOT pay a repartition shuffle (measured
    # slower on TPC-H Q1) — the scan keeps its file-layout partitioning
    monkeypatch.setattr(catalog, "FAN_OUT_MIN_BYTES", 0)
    target = spark.sparkContext.defaultParallelism
    assert load_table(spark, "lineitem", SF).rdd.getNumPartitions() < target


def test_fold_sessions_gap_semantics():
    g = _GAP_US
    # strictly inside the gap extends; exactly at the gap starts anew
    closed, cur = fold_sessions([0, g - 1], [1, 2])
    assert closed == [] and cur == (0, g - 1, 2, 3)
    closed, cur = fold_sessions([0, g], [1, 2])
    assert closed == [(0, 0, 1, 1)] and cur == (g, g, 1, 2)


def test_fold_sessions_multi_and_empty():
    assert fold_sessions([], []) == ([], None)
    g = _GAP_US
    ts = [0, 10, 2 * g, 2 * g + 5, 5 * g]
    vs = [1, 1, 1, 1, 1]
    closed, cur = fold_sessions(ts, vs)
    assert closed == [(0, 10, 2, 2), (2 * g, 2 * g + 5, 2, 2)]
    assert cur == (5 * g, 5 * g, 1, 1)
