"""Scale-pressure probe for the foreachBatch CDC apply (VERDICT r7
item 4): replay the sf1 events table as a CDC changelog in K
time-ordered micro-batches through run_cdc_apply_to_files, then verify

- the SERVING parquet equals the batch twin (cdc_apply_batch: full-log
  latest-wins, tombstones dropped) — replay == batch EXACT;
- the STATE copy is key-domain bounded: exactly one row per ever-seen
  user (live + tombstoned), never stream-volume;
- tombstones really are retained in state (the no-resurrection
  invariant) while being absent from the serving table.

Usage: python scripts/cdc_state_probe.py [sf_dir] [n_batches]
Writes one JSON line to stdout (redirect to the artifact file).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table  # noqa: E402
from mrc_spark_jobs_pubmed_spark.streaming import jobs as J  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_session(app_name="cdc-state-probe", shuffle_partitions=32)
    ev = load_table(spark, "events", sf_dir)
    n_rows = ev.count()
    n_users = ev.select("user_id").distinct().count()

    work = tempfile.mkdtemp(prefix="cdc_probe_")
    try:
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        span = (hi - lo) / n_batches
        for i in range(n_batches):
            cond = (F.col("ts") >= F.lit(lo + i * span)) & (
                (F.col("ts") <= F.lit(hi))
                if i == n_batches - 1
                else (F.col("ts") < F.lit(lo + (i + 1) * span))
            )
            ev.where(cond).coalesce(1).write.parquet(f"{work}/src/t{i:03d}")

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(f"{work}/src")
        )
        serving = f"{work}/serving"
        t0 = time.time()
        q = J.run_cdc_apply_to_files(stream, serving, f"{work}/ckpt")
        q.processAllAvailable()
        n_micro = len([p for p in q.recentProgress if p.get("numInputRows")])
        q.stop()
        wall = time.time() - t0

        got = {tuple(r) for r in spark.read.parquet(serving).collect()}
        want = {tuple(r) for r in J.cdc_apply_batch(ev).collect()}

        state_glob = glob.glob(f"{serving}_state/v*")
        state = spark.read.parquet(state_glob[-1]) if state_glob else None
        n_state = state.count() if state is not None else 0
        n_state_keys = (
            state.select("user_id").distinct().count() if state is not None else 0
        )
        n_tomb = (
            state.where(F.col("op") == "delete").count()
            if state is not None
            else 0
        )
        state_bytes = sum(
            os.path.getsize(os.path.join(d, f))
            for d in state_glob
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        # per-batch pre-reduction bound (r9 skew probe): cdc_latest
        # reduces each micro-batch to one row per key BEFORE the
        # state merge, so merge input is <= keys-in-batch no matter
        # how hot a key is — measured here per fed batch (raw rows vs
        # distinct keys, the exact size cdc_latest emits)
        per_batch = []
        for d in sorted(glob.glob(f"{work}/src/t*")):
            b = spark.read.parquet(d)
            r = b.agg(
                F.count("*").alias("raw"),
                F.countDistinct("user_id").alias("reduced"),
            ).collect()[0]
            per_batch.append({"raw": r.raw, "reduced": r.reduced})
        max_raw = max(p["raw"] for p in per_batch)
        max_red = max(p["reduced"] for p in per_batch)
        out = {
            "job": "cdc_apply",
            "sf_dir": sf_dir,
            "n_rows": n_rows,
            "n_users": n_users,
            "n_batches_fed": n_batches,
            "n_microbatches": n_micro,
            "wall_sec": round(wall, 2),
            "replay_equals_batch": got == want and len(want) > 0,
            "serving_rows": len(got),
            "state_rows": n_state,
            "state_one_row_per_key": n_state == n_state_keys,
            "state_rows_equals_user_domain": n_state == n_users,
            "tombstones_in_state": n_tomb,
            "tombstones_absent_from_serving": n_tomb > 0
            and len(got) == n_state - n_tomb,
            "state_file_bytes": state_bytes,
            "state_bytes_per_key": (
                round(state_bytes / n_state, 1) if n_state else None
            ),
            "per_batch_raw_vs_reduced": per_batch,
            "max_raw_batch_rows": max_raw,
            "max_reduced_batch_rows": max_red,
            "pre_reduction_bounded_by_key_domain": max_red <= n_users,
        }
        print(json.dumps(out))
        return 0 if out["replay_equals_batch"] else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
