"""Bucketed tables co-locate big-big joins: writing both sides bucketed
by the join key lets the sort-merge join read pre-partitioned data with
ZERO shuffle — the storage-level lever for repeated 100 TB fact-fact
joins that AQE cannot conjure at runtime (SURVEY.md §4 partitioning
story; complements the explicit-repartition and broadcast levers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    try:
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("bkt_lineitem")
        )
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bkt_orders")
        )
        # disable broadcast so the join strategy is the bucketed SMJ the
        # 100 TB case would use
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = (
                spark.table("bkt_lineitem")
                .join(
                    spark.table("bkt_orders"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
            )
            plan = j._sc._jvm.PythonSQLUtils.explainString(
                j._jdf.queryExecution(), "formatted"
            )
            join_part = plan.split("HashAggregate")[0]
            # the join itself must consume bucketed scans directly: no
            # Exchange below the join (the agg above it may shuffle)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in join_part, join_part
            # and the result must match the unbucketed plan
            want = {
                (r.o_orderpriority, r.n)
                for r in li.join(
                    orders, li.l_orderkey == orders.o_orderkey
                )
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            got = {(r.o_orderpriority, r.n) for r in j.collect()}
            assert got == want and len(got) > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
