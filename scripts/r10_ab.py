"""Round-10 A/B measurement harness: per-query explain capture + timing.

For each named query, in ONE session (bench.py's exact conf at the
bench sf; plain session conf at bigger sfs), capture:
  * .explain("formatted") -> plans/r10/<name>_<tag>.txt
  * median-of-N noop-sink wall times (warm run first), bench.py
    methodology

Run it once on the pre-edit tree with tag=before, once post-edit with
tag=after; the JSON outputs are the same-session A/B receipts for
OPTIMIZATION_r10.md.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    python scripts/r10_ab.py --tag before --out AB_r10_before.json NAME...
Options:
  --runs N       timed samples per query (default 5, median reported)
  --plans-dir D  where explain files go (default plans/r10)
  --no-plans     skip explain capture (timing only)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--plans-dir", default="plans/r10")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument(
        "--explain-only",
        action="store_true",
        help="capture plans without timing (usable on a busy machine)",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # bench.py conf at the bench sf so numbers are comparable to BENCH
    # files; default session conf at sf>=1 (matches bvd_sweep).
    extra = (
        {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"}
        if sf is not None and sf <= 0.5
        else {}
    )
    spark = get_session(app_name=f"r10-ab-{args.tag}", extra_conf=extra)
    registry = plans.all_queries()
    os.makedirs(args.plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in args.names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"r10:{args.tag}:{name}")
        df = q.fn(spark, sf_dir)
        if not args.no_plans:
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan_txt)
        if args.explain_only:
            print(f"{name}: plan captured", flush=True)
            continue
        # warm (JIT + codegen), then median of N
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        samples.sort()
        mid = len(samples) // 2
        med = (
            samples[mid]
            if len(samples) % 2
            else (samples[mid - 1] + samples[mid]) / 2
        )
        results[name] = {
            "median_sec": round(med, 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"{name}: {results[name]['median_sec']} s", flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(args.out, "w") as f:
        json.dump(
            {"tag": args.tag, "sf": sf, "sf_dir": sf_dir, "runs": args.runs,
             "queries": results},
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()