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


def test_bucketed_edge_table_iterative_join_no_shuffle(spark):
    """The repeated-query path for graph analytics (BFS / PageRank /
    LPA all re-join the same edge list every iteration AND every run):
    materialize the trade-graph edge list ONCE as a table bucketed by
    src, and each frontier expansion's join consumes the bucketed scan
    with no exchange under the join — the storage-level form of the
    `repartition("src") + localCheckpoint` idiom the in-session
    operators use, and what turns the sf5 edge-build cost (the measured
    hot spot of graph_bfs_levels) into a one-time write."""
    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    e0 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 10_000_000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    spark.sql("DROP TABLE IF EXISTS bkt_edges")
    try:
        (
            edges.write.bucketBy(8, "src")
            .sortBy("src")
            .mode("overwrite")
            .saveAsTable("bkt_edges")
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bedges = spark.table("bkt_edges")
            root = edges.agg(F.min("src").alias("m")).collect()[0][0]
            # two frontier expansions, each joining the bucketed edges
            frontier = spark.createDataFrame(
                [(root,)], "node long"
            ).repartition(8, "node")
            reached = {root}
            for _ in range(2):
                step = (
                    bedges.join(
                        frontier, bedges.src == frontier.node
                    )
                    .select(F.col("dst").alias("node"))
                    .distinct()
                )
                plan = step._sc._jvm.PythonSQLUtils.explainString(
                    step._jdf.queryExecution(), "formatted"
                )
                # the edge side of the join must be the bucketed scan,
                # not an Exchange: count exchanges strictly below the
                # join — the frontier side may shuffle (it is tiny),
                # the edge side must not
                assert "SortMergeJoin" in plan, plan
                assert "Bucketed: true" in plan, plan
                new_nodes = {r.node for r in step.collect()}
                frontier = step.localCheckpoint(eager=True)
                reached |= new_nodes
            # 2-hop reachability from the root must match the
            # non-bucketed edge list
            want = {root}
            fr = {root}
            edge_rows = [(r.src, r.dst) for r in edges.collect()]
            for _ in range(2):
                fr = {d for (s, d) in edge_rows if s in fr}
                want |= fr
            assert reached == want and len(reached) > 1
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_edges")
