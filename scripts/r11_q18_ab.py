"""Round-11 item-6 probe: rel_q18_big_orders' orders⋈big join at scale.

VERDICT r10 asked for a runtime-Bloom creation from the qty>250 tail onto
the orders scan. The automatic injection (SPARK-32268) cannot fire here:
InjectRuntimeFilter requires the creation side's join key to come from a
selective filter OVER A SCAN, and `big` is an aggregate (HAVING sum>250)
— there is no scan-level predicate to qualify it. The manual route is
also closed in PySpark: `bloom_filter_agg`/`might_contain` are internal
expressions, not registered SQL routines (probed on this Spark 4.1.2:
UNRESOLVED_ROUTINE), and DataFrameStatFunctions.bloomFilter is
Scala-only. So this A/B probes the two strategies that ARE expressible
and scale-safe, against the current AQE-decided plan:

  current  — registered plan (static SMJ at sf20; AQE may convert).
  shj      — SHUFFLE_HASH hint on `big`: per-partition build side is
             ~1.5% of the probe side's bytes (the qty>250 tail fraction
             is scale-invariant), so the build is partition-bounded at
             any corpus size; skips the 30M-row sort of SMJ.
  bitmap   — hand-rolled Bloom with ONE hash: fold big's keys into a
             fixed 2^23-slot bitmap stored as <=2^17 (word, bits) rows
             — a CONSTANT-bounded broadcast (~2 MB max, regardless of
             corpus size) — and left-semi the orders scan against it
             (word equality + bit test) BEFORE the exchange, so only
             ~(tail + false positives) of orders shuffles. big is
             localCheckpoint'ed (per-invocation, the q11 precedent) so
             the 120M-row qty aggregate is not computed twice. At 100x
             corpus the bitmap saturates and degrades to a no-op filter
             — graceful, never wrong.

Usage:
  SPARK_GRAFT_SF_DIR=testdata/sf20 python scripts/r11_q18_ab.py \
      --out AB_r11_q18_sf20.json [--runs 5]
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

BITMAP_BITS = 1 << 23  # fixed: bitmap table <= 2^17 rows / ~2 MB broadcast


def _big(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey", F.round("qty", 2).alias("total_qty"))
    )


def _finish(orders, cust, big):
    top = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )
    return (
        F.broadcast(top)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


def v_shj(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = _big(spark, sf_dir).hint("shuffle_hash")
    return _finish(orders, cust, big)


def v_bitmap(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = _big(spark, sf_dir).localCheckpoint(eager=True)
    nb = F.lit(BITMAP_BITS).cast("long")
    words = (
        big.select(F.pmod(F.xxhash64("l_orderkey"), nb).alias("b"))
        .groupBy((F.col("b") / 64).cast("long").alias("w"))
        .agg(
            F.bit_or(F.expr("shiftleft(1L, cast(b % 64 as int))")).alias("bits")
        )
    )
    ob = F.pmod(F.xxhash64("o_orderkey"), nb)
    pre = (
        orders.withColumn("_w", (ob / 64).cast("long"))
        .withColumn("_bit", (ob % 64).cast("int"))
        .join(
            F.broadcast(words),
            (F.col("_w") == F.col("w"))
            & (F.expr("(bits >> _bit) & 1") == F.lit(1)),
            "left_semi",
        )
        .drop("_w", "_bit")
    )
    return _finish(pre, cust, big)


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
    spark = get_session(app_name="r11-q18-ab")
    q = plans.all_queries()["rel_q18_big_orders"]

    builders = {
        "current": lambda s, d: q.fn(s, d),
        "shj": v_shj,
        "bitmap": v_bitmap,
    }

    ref = _canon(q.fn(spark, sf_dir))
    checks = {}
    for vn, fn in builders.items():
        if vn == "current":
            continue
        got = _canon(fn(spark, sf_dir))
        checks[vn] = "identical" if got == ref else "MISMATCH"
        print(f"{vn}: values {checks[vn]}", flush=True)

    for vn, fn in builders.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {vn: [] for vn in builders}
    for _ in range(args.runs):
        for vn, fn in builders.items():
            spark.sparkContext.setJobDescription(f"r11q18:{vn}")
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
                "rounds, noop sink; value identity checked first",
                "sf": sf,
                "sf_dir": sf_dir,
                "queries": {"rel_q18_big_orders": out},
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
