"""Hot-key crossover A/B: bounded RANGE frame vs difference stream.

r8 found Spark's SlidingWindowFunctionFrame re-aggregates the whole
in-frame buffer per output row, so a bounded trailing frame is
O(rows x in-frame rows) per key. The r9 escape hatch
(`rel_window_range_frame_diff`) computes the same rolling-90-day-spend
semantics linearly. This script MEASURES the crossover the docstrings
claim: a hot customer with N orders at distinct seconds inside one
90-day span (every row in every later row's frame — the quadratic
regime), timed at doubling N for BOTH registered plans, with value
equality asserted at every size.

Writes RANGE_FRAME_AB_r9.json:
  {"sizes": [{"n_hot": N, "bounded_sec": .., "diff_sec": ..,
              "values_equal": true}, ...]}

Usage:  python scripts/range_frame_ab.py [OUT.json]
Env:    RFAB_SIZES=20000,40000,80000   (hot-key row counts)
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402

W_S = 90 * 24 * 3600


def build_fixture(spark, root: str, n_hot: int) -> str:
    """One customer owns n_hot orders at 7-second spacing (span
    n_hot*7 s << 90 d for n_hot <= 1.1M, so the trailing frame grows
    to the full key); 1000 cold customers with 10 orders each."""
    from pyspark.sql import functions as F

    t0 = datetime.datetime(2024, 1, 1)
    hot = (
        spark.range(n_hot)
        .select(
            F.col("id").alias("o_orderkey"),
            F.lit(7).cast("long").alias("o_custkey"),
            (F.lit(t0) + F.make_interval(secs=F.col("id") * 7)).alias(
                "o_orderdate"
            ),
            (1.0 + (F.col("id") % 97)).alias("o_totalprice"),
        )
    )
    cold = (
        spark.range(10_000)
        .select(
            (F.col("id") + 10_000_000).alias("o_orderkey"),
            (F.col("id") % 1000 + 100).cast("long").alias("o_custkey"),
            (F.lit(t0) + F.make_interval(hours=F.col("id") % 2000)).alias(
                "o_orderdate"
            ),
            (10.0 + (F.col("id") % 13)).alias("o_totalprice"),
        )
    )
    path = os.path.join(root, f"hot{n_hot}")
    os.makedirs(path, exist_ok=True)
    hot.unionByName(cold).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "orders.parquet")
    )
    return path


def checksum(df) -> tuple:
    """Order-insensitive value fingerprint + row count."""
    from pyspark.sql import functions as F

    r = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("o_orderkey", "o_custkey", "spend_90d").cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).collect()[0]
    return (r.n, r.h)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RANGE_FRAME_AB_r9.json"
    sizes = [
        int(s)
        for s in os.environ.get("RFAB_SIZES", "20000,40000,80000").split(",")
    ]
    spark = get_session(app_name="range-frame-ab")
    bounded = plans.get("rel_window_range_frame").fn
    diff = plans.get("rel_window_range_frame_diff").fn
    root = tempfile.mkdtemp(prefix="rfab_")
    results = []
    try:
        for n in sizes:
            sf_dir = build_fixture(spark, root, n)
            rec = {"n_hot": n}
            for label, fn in (("diff", diff), ("bounded", bounded)):
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()  # warm
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                rec[f"{label}_sec"] = round(time.time() - t0, 3)
            rec["values_equal"] = checksum(diff(spark, sf_dir)) == checksum(
                bounded(spark, sf_dir)
            )
            results.append(rec)
            print(rec, flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "fixture": "one customer owns n_hot orders at 7 s spacing "
                "(whole key inside one 90-day frame) + 10k cold rows",
                "sizes": results,
            },
            f,
            indent=1,
        )
        f.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
