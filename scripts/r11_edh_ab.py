"""Round-11 extension: rel_histogram_equidepth's single-task global ntile.

The registered plan ntiles ALL orders over an empty-partitionBy window —
one task sorts the corpus (the r9 revenue_pareto defect class; Spark
even logs "No Partition Defined for Window operation"). This A/B probes
the same fix that shipped for revenue_pareto in r9: repartitionByRange
on the ntile's total order + per-range row_number + broadcast offsets
for the exact global rank, and ntile's allocation reproduced as the
integer CASE (first n%k buckets hold n div k + 1 rows) — fully
parallel, exact at any scale.

Usage:
  SPARK_GRAFT_SF_DIR=testdata/sf20 python scripts/r11_edh_ab.py \
      --out AB_r11_edh_sf20.json [--runs 5]
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.plans.extra_queries import EDH_BUCKETS  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table  # noqa: E402


def v_parallel(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    base = orders.select(
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    srt = base.repartitionByRange(
        64, F.asc("o_totalprice"), F.asc("o_orderkey")
    ).withColumn("pid", F.spark_partition_id())
    wloc = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    loc = srt.withColumn("lrn", F.row_number().over(wloc))
    cnts = loc.groupBy("pid").agg(F.count("*").alias("c"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = cnts.select(
        "pid", F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("off")
    )
    ntot = cnts.agg(F.sum("c").cast("long").alias("n"))
    k = EDH_BUCKETS
    ranked = (
        loc.join(F.broadcast(offs), "pid")
        .withColumn("rank", (F.col("off") + F.col("lrn")).cast("long"))
        .crossJoin(F.broadcast(ntot))
        .withColumn(
            "bucket",
            F.expr(
                f"CASE WHEN rank <= (n div {k} + 1) * (n % {k})"
                f" THEN (rank - 1) div (n div {k} + 1) + 1"
                f" ELSE (n % {k})"
                f"  + (rank - 1 - (n % {k}) * (n div {k} + 1)) div (n div {k})"
                "  + 1 END"
            ),
        )
    )
    return ranked.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


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
    spark = get_session(app_name="r11-edh-ab")
    q = plans.all_queries()["rel_histogram_equidepth"]

    builders = {"current": lambda s, d: q.fn(s, d), "parallel": v_parallel}

    ref = _canon(q.fn(spark, sf_dir))
    got = _canon(v_parallel(spark, sf_dir))
    check = "identical" if got == ref else "MISMATCH"
    print(f"parallel: values {check}", flush=True)

    for vn, fn in builders.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {vn: [] for vn in builders}
    for _ in range(args.runs):
        for vn, fn in builders.items():
            spark.sparkContext.setJobDescription(f"r11edh:{vn}")
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
    out["parallel"]["values"] = check

    with open(args.out, "w") as f:
        json.dump(
            {
                "method": f"same-session interleaved, median of {args.runs} "
                "rounds, noop sink; value identity checked first",
                "sf": sf,
                "sf_dir": sf_dir,
                "queries": {"rel_histogram_equidepth": out},
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
