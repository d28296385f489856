"""Probe scale-safe join configs on the post-broadcast-sweep plans.

The r10 broadcast-policy sweep removed forced broadcasts of corpus-
growing sides; at sf20 the replacement SMJ sorts the fact side (q3
6.5 -> 53 s). The guide's size-gated levers for exactly this shape:

  shj   : preferSortMergeJoin=false + AQE maxShuffledHashJoinLocalMap-
          Threshold — hash join instead of sorting the fact side, gated
          by per-partition build size (guide 3.1 / 9)
  bloom : runtime Bloom-filter injection thresholds opened so a
          selective dim/slice prunes the fact side BEFORE its exchange
          (guide 3.2), gated by creation-side size estimate
  both  : the two combined

All are runtime-settable SQL confs — variants run interleaved in ONE
session (set/restore around each timed run), so numbers are same-
session A/Bs.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/r10_conf_probe.py \
           --out OUT.json [--runs 3] NAME...
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

SHJ = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
}
BLOOM = {
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "268435456",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1073741824",
    "spark.sql.optimizer.runtime.bloomFilter.maxNumItems": "67108864",
    "spark.sql.optimizer.runtime.bloomFilter.maxNumBits": "536870912",
}

B256 = {
    # size-GATED adaptive broadcast: 256m is the 'fits' line (guide 3.1:
    # a few hundred MB is usually fine; the 8 GiB cap stays 30x away).
    # At corpus scale the same sides exceed the gate and AQE falls back
    # to the shuffled join + bloom pre-filter.
    "spark.sql.autoBroadcastJoinThreshold": "268435456",
}

CONFS: dict[str, dict[str, str]] = {
    "base": {},
    "shj": SHJ,
    "bloom": BLOOM,
    "both": {**SHJ, **BLOOM},
    "b256": {**SHJ, **BLOOM, **B256},
    # b256 WITHOUT SHJ: raising autoBroadcastJoinThreshold also feeds
    # shuffled-hash's canBuildLocalHashMap gate (threshold x partitions)
    # and the combined variant OOM'd building a hash relation at sf20
    # ("Can't acquire 67108864 bytes") — committed negative result. The
    # broadcast gate alone routes big-but-fitting sides through BHJ
    # (driver-built, 16g headroom) instead.
    "bloom_b256": {**BLOOM, **B256},
    # adaptive-only gate: static planning keeps the conservative 64m
    # (estimates lie after filters), while AQE may broadcast a side
    # whose MEASURED shuffle size is under 256m — the runtime number is
    # trustworthy, the estimate is not.
    "bloom_a256": {
        **BLOOM,
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "268435456",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--variants", default="base,shj,bloom,both")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session(app_name="r10-conf-probe")
    registry = plans.all_queries()
    variants = {v: CONFS[v] for v in args.variants.split(",")}

    def run(name, conf):
        saved = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    out: dict[str, dict] = {}
    for name in args.names:
        samples: dict[str, list[float]] = {v: [] for v in variants}
        for v, conf in variants.items():  # warm each variant once
            spark.sparkContext.setJobDescription(f"r10conf:{name}:{v}:warm")
            run(name, conf)
        for _ in range(args.runs):
            for v, conf in variants.items():
                spark.sparkContext.setJobDescription(f"r10conf:{name}:{v}")
                samples[v].append(run(name, conf))
        row = {}
        for v, ss in samples.items():
            ss.sort()
            mid = len(ss) // 2
            med = ss[mid] if len(ss) % 2 else (ss[mid - 1] + ss[mid]) / 2
            row[v] = {"median_sec": round(med, 3),
                      "samples": [round(x, 3) for x in ss]}
        out[name] = row
        print(name, {v: row[v]["median_sec"] for v in row}, flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(args.out, "w") as f:
        json.dump(
            {"method": f"same-session interleaved conf A/B, median of "
             f"{args.runs}, noop sink", "sf": sf, "sf_dir": sf_dir,
             "confs": CONFS, "queries": out},
            f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
