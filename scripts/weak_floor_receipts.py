"""Per-query floor receipts for the weak trio (VERDICT r8 item 2).

The three standing weak rows all got replans + A/B receipts in r8 but
no DECOMPOSITION showing where the residual >2x lives — the suspects
were prose (ROUNDLOG r8): sim_mmr_rerank's pool-cut scan + checkpoint/
pandas machinery, rel_multitouch_attribution's touched-pairs windows,
graph_bom_explosion's 44M-row closure materialization. This script
times each query's STAGES in isolation (fresh-session, median-of-N,
noop sink — the r8 sweep-tail lesson) so each row either joins an
adjudicated class WITH its receipt or stays weak with the residual
located.

Stage cuts (mirroring the plan code — constants imported from the plan
modules so a constant change invalidates the receipt loudly):

- sim_mmr_rerank: pool_cut (cosine scan + TakeOrdered) -> pool_ckpt
  (+localCheckpoint) -> pairs (+k^2 grid) -> full (+grouped-pandas
  greedy).
- rel_multitouch_attribution: join (left-outer range join, readout via
  plain agg) -> windows (+the two purchase_id windows) -> full
  (+channel rollup).
- graph_bom_explosion: base (checkpointed edge build) -> closure
  (binary-decomposition fold, readout via count) -> full (+filter and
  root rollup).

Writes WEAK_FLOOR_RECEIPTS_r9.json at the repo root; embed rulings in
scripts/perf_index.py ADJUDICATIONS citing this artifact.

Usage: SPARK_GRAFT_SF_DIR=testdata/sf20 python scripts/weak_floor_receipts.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from bench import SF_DIR  # noqa: E402
from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.operators import similarity as S  # noqa: E402
from mrc_spark_jobs_pubmed_spark.plans.graph_queries import (  # noqa: E402
    BOM_DOUBLINGS,
    BOM_ROOTS,
)
from mrc_spark_jobs_pubmed_spark.plans.relational_queries import (  # noqa: E402
    MTA_LOOKBACK_US,
)
from mrc_spark_jobs_pubmed_spark.plans.similarity_queries import (  # noqa: E402
    MMR_POOL,
    QUERY_VEC_ID,
)
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table  # noqa: E402

N_RUNS = 3


def timed(build, n=N_RUNS) -> float:
    """Median wall-clock of n fresh builds written to the noop sink.

    build() must return a NEW DataFrame each call so localCheckpoint
    stages re-execute instead of replaying a cached RDD."""
    runs = []
    for _ in range(n):
        # t0 BEFORE build(): eager localCheckpoint stages execute during
        # DataFrame construction, not at the sink write
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)


# --- sim_mmr_rerank stages ----------------------------------------------------


def mmr_pool(spark, ckpt: bool):
    emb = load_table(spark, "embeddings", SF_DIR)
    qdf = emb.filter(F.col("vec_id") == QUERY_VEC_ID)
    q = F.broadcast(qdf.select(F.col("embedding").alias("_qe")))
    pool = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(q)
        .select(
            "vec_id",
            "embedding",
            F.round(S.cosine_named("embedding", "_qe") * 1000000)
            .cast("long")
            .alias("rel_u6"),
        )
        .orderBy(F.desc("rel_u6"), F.asc("vec_id"))
        .limit(MMR_POOL)
    )
    return pool.localCheckpoint(eager=True) if ckpt else pool


def mmr_pairs(spark):
    pool = mmr_pool(spark, ckpt=True)
    a = pool.select(F.col("vec_id").alias("aa"), F.col("embedding").alias("ea"))
    b = pool.select(F.col("vec_id").alias("bb"), F.col("embedding").alias("eb"))
    return a.join(F.broadcast(b), F.col("aa") != F.col("bb")).select(
        "aa",
        "bb",
        F.round(S.cosine_named("ea", "eb") * 1000000).cast("long").alias("sim_u6"),
    )


# --- rel_multitouch_attribution stages ----------------------------------------


def mta_touched(spark):
    ev = load_table(spark, "events", SF_DIR)
    k = F.get_json_object("props", "$.k").cast("int")
    channel = (
        F.when(F.col("props").isNull(), F.lit("email"))
        .when(k % 4 == 0, "organic")
        .when(k % 4 == 1, "paid")
        .when(k % 4 == 2, "social")
        .otherwise("email")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("t_c"),
        F.col("event_id").alias("click_id"),
        channel.alias("channel"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t_p"),
        F.col("event_id").alias("purchase_id"),
        F.round(F.col("value") * 10000).cast("long").alias("v_u4"),
    )
    in_window = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("t_c") <= F.col("t_p"))
        & (F.col("t_c") > F.col("t_p") - F.lit(MTA_LOOKBACK_US))
    )
    return purchases.join(clicks, in_window, "left")


def mta_join_only(spark):
    # plain agg readout: forces the join, adds only a map-side combine
    return mta_touched(spark).agg(
        F.count("*").alias("n"), F.sum("v_u4").alias("s")
    )


def mta_with_windows(spark):
    from pyspark.sql import Window

    touched = mta_touched(spark)
    w_n = Window.partitionBy("purchase_id")
    w_r = Window.partitionBy("purchase_id").orderBy("t_c", "click_id")
    split = touched.select(
        F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
        (
            F.expr("v_u4 div count(*) over (partition by purchase_id)")
            + F.when(
                F.row_number().over(w_r) == 1,
                F.col("v_u4") % F.count("*").over(w_n),
            ).otherwise(F.lit(0))
        ).alias("share_u4"),
    )
    return split.agg(F.count("*").alias("n"), F.sum("share_u4").alias("s"))


# --- graph_bom_explosion stages -----------------------------------------------


def bom_base(spark, ckpt=True):
    part = load_table(spark, "part", SF_DIR)
    base = part.where(F.col("p_partkey") >= BOM_ROOTS).select(
        F.col("p_partkey").alias("node"),
        F.expr("p_partkey div 4").alias("anc"),
        (F.col("p_partkey") % 3 + 1).cast("long").alias("q"),
    )
    return base.localCheckpoint(eager=True) if ckpt else base


def bom_closure(spark):
    def compose(ab, cd):
        left = ab.select(
            F.col("node").alias("l_node"),
            F.col("anc").alias("l_anc"),
            F.col("q").alias("l_q"),
        )
        right = cd.select(
            F.col("node").alias("r_node"),
            F.col("anc").alias("r_anc"),
            F.col("q").alias("r_q"),
        )
        return left.join(right, F.col("l_anc") == F.col("r_node")).select(
            F.col("l_node").alias("node"),
            F.col("r_anc").alias("anc"),
            (F.col("l_q") * F.col("r_q")).alias("q"),
        )

    base = bom_base(spark)
    closure = base
    dpow = base
    for t in range(1, BOM_DOUBLINGS + 1):
        dpow = compose(dpow, dpow)
        if t < BOM_DOUBLINGS:
            dpow = dpow.localCheckpoint(eager=True)
            grown = closure.unionByName(dpow).unionByName(
                compose(closure, dpow)
            )
            closure = (
                grown.localCheckpoint(eager=True)
                if t < BOM_DOUBLINGS - 1
                else grown
            )
        else:
            closure = closure.unionByName(dpow)
    return closure


def main() -> None:
    spark = get_session(
        app_name="weak-floor-receipts",
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
    )
    reg = plans.all_queries()
    out: dict[str, dict] = {}

    full_mmr = timed(lambda: reg["sim_mmr_rerank"].fn(spark, SF_DIR))
    out["sim_mmr_rerank"] = {
        "pool_cut_sec": timed(lambda: mmr_pool(spark, ckpt=False)),
        "pool_ckpt_sec": timed(lambda: mmr_pool(spark, ckpt=True)),
        "pairs_sec": timed(lambda: mmr_pairs(spark)),
        "full_sec": full_mmr,
    }
    print(out["sim_mmr_rerank"], flush=True)

    full_mta = timed(lambda: reg["rel_multitouch_attribution"].fn(spark, SF_DIR))
    out["rel_multitouch_attribution"] = {
        "join_only_sec": timed(lambda: mta_join_only(spark)),
        "join_windows_sec": timed(lambda: mta_with_windows(spark)),
        "full_sec": full_mta,
    }
    print(out["rel_multitouch_attribution"], flush=True)

    full_bom = timed(lambda: reg["graph_bom_explosion"].fn(spark, SF_DIR))
    out["graph_bom_explosion"] = {
        "base_ckpt_sec": timed(lambda: bom_base(spark).limit(0)),
        "closure_sec": timed(
            lambda: bom_closure(spark).agg(F.count("*").alias("n"))
        ),
        "full_sec": full_bom,
    }
    print(out["graph_bom_explosion"], flush=True)

    path = "WEAK_FLOOR_RECEIPTS_r9.json"
    with open(path, "w") as f:
        json.dump(
            {"sf_dir": SF_DIR, "n_runs_median": N_RUNS, "receipts": out},
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
