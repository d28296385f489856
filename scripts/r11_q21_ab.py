"""Round-11 follow-up probe: rel_q21_waiting_suppliers residual at sf20.

The r11 one-pass rewrite (42→~19 s on the prior host) re-measures at
14.1 s on this host against a comparator that ALSO got faster from the
splittable fixture layout (13.4→5.6 s), putting the ratio at 2.54 — over
the measured-ok gate. This probe attacks the residual: the oracle's
EXISTS/NOT-EXISTS predicates are *intra-order* (they only reference the
order's own lineitems), and every output row requires o_orderstatus='F',
so restricting lineitem to F-order keys BEFORE the per-order aggregate
is exact and roughly halves the bytes entering the heavy shuffle — and
it replaces the post-aggregate orders join (the same restriction, paid
on far more rows) outright.

Variants:
  current      — registered one-pass plan.
  early_f      — left-semi lineitem against F-order keys, planner's
                 choice of strategy; both aggregate levels stay
                 exchange-free on the semi join's hash(l_orderkey)
                 output partitioning.
  early_f_shj  — same with SHUFFLE_HASH hint on the key set: the build
                 side is the F-key slice of orders, a fixed fraction
                 (~half) of orders bytes per partition at any scale, so
                 it is partition-bounded; skips the SMJ's 120M-row sort.
  pairs_only / per_order_only — stage decomposition of the current
                 plan (NO value check; locates the residual).

Usage:
  SPARK_GRAFT_SF_DIR=testdata/sf20 python scripts/r11_q21_ab.py \
      --out AB_r11_q21_sf20.json [--runs 5]
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

NO_VALUE_CHECK = {"pairs_only", "per_order_only"}


def _pairs(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.select(
            "l_orderkey",
            "l_suppkey",
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("late"),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )


def v_pairs_only(spark, sf_dir):
    return _pairs(spark, sf_dir)


def v_per_order_only(spark, sf_dir):
    return _pairs(spark, sf_dir).groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )


def _early_f(spark, sf_dir, hint: str | None):
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    ok_f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    if hint:
        ok_f = ok_f.hint(hint)
    pairs = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("late"),
        )
        .join(ok_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    blamed = per_order.where(
        (F.col("n_late") == 1) & (F.col("n_supp") >= 2)
    ).select("late_supp")
    return (
        blamed.join(supp, F.col("late_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def v_early_f(spark, sf_dir):
    return _early_f(spark, sf_dir, None)


def v_early_f_shj(spark, sf_dir):
    return _early_f(spark, sf_dir, "shuffle_hash")


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
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "testdata/sf20")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session(app_name="r11-q21-ab")
    q = plans.all_queries()["rel_q21_waiting_suppliers"]

    builders = {
        "current": lambda s, d: q.fn(s, d),
        "early_f": v_early_f,
        "early_f_shj": v_early_f_shj,
        "pairs_only": v_pairs_only,
        "per_order_only": v_per_order_only,
    }

    ref = _canon(q.fn(spark, sf_dir))
    checks = {}
    for vn, fn in builders.items():
        if vn == "current" or vn in NO_VALUE_CHECK:
            continue
        got = _canon(fn(spark, sf_dir))
        checks[vn] = "identical" if got == ref else "MISMATCH"
        print(f"{vn}: values {checks[vn]}", flush=True)

    for vn, fn in builders.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {vn: [] for vn in builders}
    for _ in range(args.runs):
        for vn, fn in builders.items():
            spark.sparkContext.setJobDescription(f"r11q21:{vn}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[vn].append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    out = {}
    for vn, ss in samples.items():
        ss.sort()
        mid = len(ss) // 2
        med = ss[mid] if len(ss) % 2 else (ss[mid - 1] + ss[mid]) / 2
        out[vn] = {"median_sec": round(med, 3), "samples": [round(x, 3) for x in ss]}
        if vn in checks:
            out[vn]["values"] = checks[vn]

    with open(args.out, "w") as f:
        json.dump(
            {
                "method": f"same-session interleaved, median of {args.runs} "
                "rounds, noop sink; value identity checked first "
                "(decomposition variants excluded)",
                "sf": sf,
                "sf_dir": sf_dir,
                "queries": {"rel_q21_waiting_suppliers": out},
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(json.dumps({vn: out[vn]["median_sec"] for vn in out}))
    spark.stop()


if __name__ == "__main__":
    main()
