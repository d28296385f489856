"""Round-10 item-2 shape audits: same-session interleaved A/B variants.

For each audited query this builds the CURRENT registered plan plus one
or more candidate replans in ONE session, verifies the candidates are
value-identical to the current plan (collect + canonical compare), then
times all variants interleaved (noop sink, median of N rounds) so the
numbers carry no cross-session drift.

Variants per target (see OPTIMIZATION_r10.md for the audit notes):
  rel_json_props      current | preproject (parse $.k ONCE below the agg)
  rel_cube_sales      current | two-level ((flag,status) base, cube over ~8 rows)
  rel_rollup_sales    current | two-level
  rel_grouping_sets   current | two-level
  rel_q14_promo_revenue  current | agg-before-join (per-partkey rev, then part)
  rel_salted_agg      current | one-phase (the salting lever's price)
  sim_batch_topk      full    | score-only (stage decomposition)
  sim_rrf_fusion      full    | score-only (stage decomposition)

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    python scripts/r10_shape_ab.py --out AB_r10_shapes_sf01.json [--runs 5] [TARGET...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table  # noqa: E402


def v_json_props_preproject(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    pre = ev.select("event_type", k.alias("_k"))
    return (
        pre.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("_k").alias("_sk"),
            F.count("_k").alias("_nk"),
            F.max("_k").alias("max_k"),
        )
        .select(
            "event_type",
            "n",
            (
                F.expr("(20000 * _sk + _nk) div (2 * _nk)").cast("double")
                / 10000.0
            ).alias("avg_k"),
            "max_k",
        )
    )


def v_json_props_fanout(spark, sf_dir):
    """Guide §2.5/§6: the JSON parse is CPU-heavy per-row work that runs
    in the SCAN stage, so a compact events.parquet (225 MB snappy at
    sf20 → 2 byte-range splits) pins 20M get_json_object calls to 2 of
    32 cores. Round-robin fan-out of the two needed columns (project
    before the exchange, §2.3) decouples parse parallelism from file
    layout; volume-gated like load_table's documents/embeddings path so
    tiny fixtures keep their exchange-free plan."""
    from mrc_spark_jobs_pubmed_spark.sources import catalog

    ev = load_table(spark, "events", sf_dir)
    raw = ev.select("event_type", "props")
    path = catalog.table_path(sf_dir, "events")
    if catalog._scan_bytes(path) >= catalog.FAN_OUT_MIN_BYTES:
        raw = catalog.fan_out(raw, cache_key=path + "#json")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        raw.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("_k").alias("_sk"),
            F.count("_k").alias("_nk"),
            F.max("_k").alias("max_k"),
        )
        .select(
            "event_type",
            "n",
            (
                F.expr("(20000 * _sk + _nk) div (2 * _nk)").cast("double")
                / 10000.0
            ).alias("avg_k"),
            "max_k",
        )
    )


def v_q21_agg_form(spark, sf_dir):
    """Guide §2.3 'aggregate before you shuffle': the EXISTS/NOT-EXISTS
    pair needs only per-order facts — the distinct-supplier count and,
    when exactly one late supplier exists, WHO it is. Aggregating the
    (orderkey, suppkey) pairs to one row per order replaces the semi
    and anti joins of full pair tables with two narrow per-order
    aggregates joined on their own grouping key (no extra exchange).
    Exact: 'another supplier exists' == countDistinct(suppkey) > 1;
    'no OTHER late supplier' == late countDistinct == 1, and the sole
    late supplier is then min==max; each qualifying order contributes
    exactly one (order, supplier) row in the original too."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    la = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("_nlate"),
            F.min("l_suppkey").alias("_sk"),
        )
        .filter(F.col("_nlate") == 1)
    )
    aa = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("_nsupp"))
        .filter(F.col("_nsupp") > 1)
        .select("l_orderkey")
    )
    base = la.join(aa, "l_orderkey").join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    return (
        base.join(supp, F.col("_sk") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def v_q21_agg_form2(spark, sf_dir):
    """agg_form with the mixed countDistinct+min aggregate written as an
    EXPLICIT two-level (distinct pairs, then per-order count/min): the
    one-shot mixed form compiles to an Expand that doubles the R-pair
    volume before the first exchange; the explicit form dedupes map-side
    at pair granularity and aggregates per-order on the already-narrow
    distinct stream."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    late_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    la = (
        late_pairs.groupBy("l_orderkey")
        .agg(F.count("*").alias("_nlate"), F.min("l_suppkey").alias("_sk"))
        .filter(F.col("_nlate") == 1)
    )
    aa = (
        li.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("_nsupp"))
        .filter(F.col("_nsupp") > 1)
        .select("l_orderkey")
    )
    base = la.join(aa, "l_orderkey").join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    return (
        base.join(supp, F.col("_sk") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def v_cube_two_level(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("_s")
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("_s"), 2).alias("sum_qty")
    )


def v_rollup_two_level(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("_s"), F.count("*").alias("_c")
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("_s"), 2).alias("sum_qty"), F.sum("_c").alias("n")
    )


def v_grouping_sets_two_level(spark, sf_dir):
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, sum(c) AS n
        FROM (
          SELECT l_returnflag, l_linestatus, count(*) AS c
          FROM parquet.`{sf_dir}/lineitem.parquet`
          GROUP BY l_returnflag, l_linestatus
        )
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


def v_q14_agg_before_join(spark, sf_dir):
    from mrc_spark_jobs_pubmed_spark.plans.tpch_more_queries import (  # noqa: E501
        _rev_u4,
    )

    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev_u4()).alias("_r"))
    promo = F.when(F.col("p_type") == "PROMO", F.col("_r")).otherwise(F.lit(0))
    return (
        per_part.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.sum(promo).alias("_a"), F.sum("_r").alias("_b"))
        .select(
            (
                F.expr(
                    "(2000000 * cast(_a as decimal(38,0)) + _b) div (2 * _b)"
                ).cast("double")
                / 10000.0
            ).alias("promo_revenue")
        )
    )


def v_salted_one_phase(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(F.array_sort(F.collect_set("l_linestatus")).alias("_s"))
        .select(
            "l_returnflag", F.concat_ws("|", "_s").alias("l_linestatus_set")
        )
    )


def _batch_scored(spark, sf_dir, qn, excl):
    from mrc_spark_jobs_pubmed_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    q = F.broadcast(
        emb.where(F.col("vec_id") < qn).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("_qe")
        )
    )
    return (
        emb.where(F.col("vec_id") >= excl)
        .join(q)
        .select(
            "qid",
            "vec_id",
            F.round(S.cosine_named("embedding", "_qe"), 6).alias("cosine"),
        )
    )


def v_batch_topk_score_only(spark, sf_dir):
    return _batch_scored(spark, sf_dir, 5, 5)


def v_rrf_score_only(spark, sf_dir):
    return _batch_scored(spark, sf_dir, 3, 3)


def v_ooo_narrow_window(spark, sf_dir):
    """The pre-r10 shape: one cumulative-max window over |types|=5
    partitions — five single-threaded multi-M-row sorts at sf20."""
    from pyspark.sql import Window

    from mrc_spark_jobs_pubmed_spark.plans.timeseries_queries import (
        LATE_WATERMARK_US,
    )

    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    ).withColumn("prev_max_us", F.max("t_us").over(w))
    late = F.col("t_us") < F.col("prev_max_us") - F.lit(LATE_WATERMARK_US)
    ooo = F.col("t_us") < F.col("prev_max_us")
    return seq.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(ooo, 1).otherwise(0)).cast("long").alias("n_out_of_order"),
        F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        F.max(
            F.when(ooo, F.col("prev_max_us") - F.col("t_us")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("max_disorder_us"),
    )


def v_clip_full_sort_window(spark, sf_dir):
    """The pre-r10 shape: ALL 64n exploded rows shuffled into a
    64-partition window and fully sorted to read two ranks."""
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir)
    elems = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "e")
    ).select(
        (F.col("pos0") + 1).alias("dim"),
        "vec_id",
        F.round(F.col("e").cast("double") * 1e6).cast("long").alias("q6"),
    )
    wp = Window.partitionBy("dim")
    ranked = elems.select(
        "dim",
        "q6",
        F.row_number().over(wp.orderBy("q6", "vec_id")).alias("r"),
        F.count("*").over(wp).alias("n"),
    )
    lo = F.max(F.expr("CASE WHEN r <= (1 * n + 99) div 100 THEN q6 END"))
    hi = F.max(F.expr("CASE WHEN r <= (99 * n + 99) div 100 THEN q6 END"))
    return ranked.groupBy("dim").agg(
        F.max("n").cast("long").alias("n_vecs"),
        lo.cast("long").alias("p01_u6"),
        hi.cast("long").alias("p99_u6"),
        (hi - lo).cast("long").alias("clip_range_u6"),
        F.expr("CAST((1 * max(n) + 99) div 100 - 1 AS LONG)").alias(
            "n_clip_below"
        ),
        F.expr("CAST(max(n) - (99 * max(n) + 99) div 100 AS LONG)").alias(
            "n_clip_above"
        ),
    ).withColumn("dim", F.col("dim").cast("long"))


VARIANTS = {
    "rel_out_of_order_metrics": {"narrow_window": v_ooo_narrow_window},
    "emb_clip_calibration": {"full_sort_window": v_clip_full_sort_window},
    # preproject SHIPPED in the part-1 commit (current == preproject);
    # the remaining candidate is the layout-decoupling fan-out
    "rel_json_props": {"fanout": v_json_props_fanout},
    "rel_q21_waiting_suppliers": {
        "agg_form": v_q21_agg_form,
        "agg_form2": v_q21_agg_form2,
    },
    # current-only probes (no candidate): time today's absolute
    "rel_touch_attribution": {},
    "rel_multitouch_attribution": {},
    "rel_map_funcs": {},
    "rel_cube_sales": {"two_level": v_cube_two_level},
    "rel_rollup_sales": {"two_level": v_rollup_two_level},
    "rel_grouping_sets": {"two_level": v_grouping_sets_two_level},
    "rel_q14_promo_revenue": {"agg_before_join": v_q14_agg_before_join},
    "rel_salted_agg": {"one_phase": v_salted_one_phase},
    "sim_batch_topk": {"score_only": v_batch_topk_score_only},
    "sim_rrf_fusion": {"score_only": v_rrf_score_only},
}

# decomposition-only variants compute a DIFFERENT (sub)result on
# purpose — skip the value-identity check for them
NO_VALUE_CHECK = {"score_only"}


def _canon(df):
    cols = sorted(df.columns)

    def norm(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 6)
        return v

    rows = [tuple(norm(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows, key=repr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("targets", nargs="*", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    extra = (
        {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"}
        if sf is not None and sf <= 0.5
        else {}
    )
    spark = get_session(app_name="r10-shape-ab", extra_conf=extra)
    registry = plans.all_queries()

    targets = args.targets or list(VARIANTS)
    out: dict[str, dict] = {}
    for name in targets:
        q = registry[name]
        builders = {"current": lambda s, d, _q=q: _q.fn(s, d)}
        builders.update(VARIANTS[name])

        # value identity first (candidates must compute the same thing)
        checks = {}
        if not args.skip_check:
            ref = _canon(q.fn(spark, sf_dir))
            for vn, fn in builders.items():
                if vn == "current" or vn in NO_VALUE_CHECK:
                    continue
                got = _canon(fn(spark, sf_dir))
                checks[vn] = "identical" if got == ref else "MISMATCH"
                if got != ref:
                    print(f"{name}/{vn}: VALUE MISMATCH — not shippable",
                          flush=True)

        # warm every variant once, then interleave timed rounds
        for vn, fn in builders.items():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples: dict[str, list[float]] = {vn: [] for vn in builders}
        for _ in range(args.runs):
            for vn, fn in builders.items():
                spark.sparkContext.setJobDescription(f"r10shape:{name}:{vn}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples[vn].append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        row = {}
        for vn, ss in samples.items():
            ss.sort()
            mid = len(ss) // 2
            med = ss[mid] if len(ss) % 2 else (ss[mid - 1] + ss[mid]) / 2
            row[vn] = {
                "median_sec": round(med, 3),
                "samples": [round(x, 3) for x in ss],
            }
            if vn in checks:
                row[vn]["values"] = checks[vn]
        out[name] = row
        print(
            f"{name}: "
            + ", ".join(f"{vn}={row[vn]['median_sec']}s" for vn in row),
            flush=True,
        )

    with open(args.out, "w") as f:
        json.dump(
            {
                "method": "same-session interleaved, median of "
                f"{args.runs} rounds, noop sink",
                "sf": sf,
                "sf_dir": sf_dir,
                "queries": out,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
