"""Final r10 pin-run: decision-grade datapoints for the rows this round
replanned or re-measured.

Why not scripts/bvd_sweep.py: its warm-once/time-once single sample is
not decision-grade on the r10 host — q18's three sequential sweep
passes at sf20 read 13.2 / 29.1 / 30.1 s while a 5-sample dedicated
session reads a tight 9.0–10.4 s (OPTIMIZATION_r10.md, "contaminated
pins"). This harness runs ONE session per sf: every query warmed once,
then timed rounds interleaved across queries (so drift hits all rows
alike), median reported; the DuckDB oracle is timed the same way on the
same connection. Output is the {"sf", "queries"} shape perf_index
harvests, written as PERF_sf<sf>_y_r10.json (lexicographically after
the superseded _x_ files).

Usage: SPARK_GRAFT_SF_DIR=testdata/sf20 python scripts/r10_pin_run.py \
           OUT.json [--runs 3] NAME...
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import SF_DIR  # noqa: E402
from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _median(ss: list[float]) -> float:
    ss = sorted(ss)
    mid = len(ss) // 2
    return ss[mid] if len(ss) % 2 else (ss[mid - 1] + ss[mid]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    spark = get_session(app_name="r10-pin-run")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    registry = plans.all_queries()

    spark_s: dict[str, list[float]] = {n: [] for n in args.names}
    duck_s: dict[str, list[float]] = {n: [] for n in args.names}
    for n in args.names:  # warm both sides
        registry[n].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        con.execute(registry[n].oracle).fetchall()
    for r in range(args.runs):
        for n in args.names:
            spark.sparkContext.setJobDescription(f"pin-run:{n}")
            t0 = time.time()
            registry[n].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            spark_s[n].append(time.time() - t0)
            t0 = time.time()
            con.execute(registry[n].oracle).fetchall()
            duck_s[n].append(time.time() - t0)
        print(f"round {r + 1}/{args.runs} done", flush=True)

    queries = {}
    for n in args.names:
        s, d = round(_median(spark_s[n]), 3), round(_median(duck_s[n]), 3)
        queries[n] = {
            "spark_sec": s,
            "duckdb_sec": d,
            "ratio": round(s / d, 2) if d else None,
            "spark_samples": [round(x, 3) for x in sorted(spark_s[n])],
            "duckdb_samples": [round(x, 3) for x in sorted(duck_s[n])],
        }
        print(f"{n}: spark {s} s, duckdb {d} s", flush=True)
    with open(args.out, "w") as f:
        json.dump(
            {
                "sf": sf,
                "method": "one dedicated session per sf; all queries "
                "warmed, then interleaved timed rounds (median of "
                f"{args.runs}); noop sink / fetchall; raw samples kept",
                "queries": queries,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
