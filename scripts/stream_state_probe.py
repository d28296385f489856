"""Scale-pressure probe for the applyInPandasWithState streaming twins
(VERDICT r6 item 4): replay the sf1 events table through
stateful_interval_coalesce in K time-ordered micro-batches, record the
state-store metrics the replay tests never look at (numRowsTotal,
memoryUsedBytes per batch), and prove replay == batch at this scale.

The claim under test: open-island state is TWO longs (+ the replay
cursor) per user — so numRowsTotal must equal the user-key domain and
memory-per-key must stay flat as batches accumulate.

Usage: python scripts/stream_state_probe.py [sf_dir] [n_batches]
Writes one JSON line to stdout (redirect to the artifact file).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table  # noqa: E402
from mrc_spark_jobs_pubmed_spark.streaming import jobs as J  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_session(app_name="stream-state-probe", shuffle_partitions=32)
    ev = load_table(spark, "events", sf_dir)
    n_rows = ev.count()
    n_users = ev.select("user_id").distinct().count()

    work = tempfile.mkdtemp(prefix="stream_probe_")
    try:
        # time-ordered batch files (the documented input-order contract:
        # cross-batch arrivals nondecreasing in (a_us, event_id) per key)
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        span = (hi - lo) / n_batches
        for i in range(n_batches):
            cond = (F.col("ts") >= F.lit(lo + i * span)) & (
                (F.col("ts") <= F.lit(hi))
                if i == n_batches - 1
                else (F.col("ts") < F.lit(lo + (i + 1) * span))
            )
            ev.where(cond).coalesce(1).write.parquet(f"{work}/src/t{i:03d}")
        # sentinel: one zero-length event per user far past the end
        # drains each user's final open island
        sent = (
            ev.groupBy("user_id")
            .agg(F.max("ts").alias("mx"))
            .select(
                F.lit(10**12).cast("long").alias("event_id"),
                (F.col("mx") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
                "user_id",
                F.lit("view").alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            .select([f.name for f in ev.schema.fields])
        )
        sent.coalesce(1).write.parquet(f"{work}/src/t{n_batches:03d}")

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(f"{work}/src")
        )
        t0 = time.time()
        q = (
            J.stateful_interval_coalesce(stream)
            .writeStream.format("memory")
            .queryName("probe_ic")
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt")
            .start()
        )
        q.processAllAvailable()
        wall = time.time() - t0
        batches = []
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            so = ops[0]
            batches.append(
                {
                    "batchId": p["batchId"],
                    "inputRows": p["numInputRows"],
                    "stateRowsTotal": so.get("numRowsTotal"),
                    "stateRowsUpdated": so.get("numRowsUpdated"),
                    "stateMemBytes": so.get("memoryUsedBytes"),
                }
            )
        q.stop()

        got = {
            (r.user_id, r.n_islands, r.covered_us, r.longest_us)
            for r in spark.sql(
                "SELECT user_id, count(*) AS n_islands,"
                " sum(covered_us) AS covered_us, max(covered_us) AS longest_us"
                " FROM probe_ic GROUP BY user_id"
            ).collect()
        }
        want = {
            (r.user_id, r.n_islands, r.covered_us, r.longest_us)
            for r in plans.get("rel_interval_coalesce").fn(spark, sf_dir).collect()
        }
        final = batches[-1] if batches else {}
        out = {
            "sf_dir": sf_dir,
            "n_rows": n_rows,
            "n_users": n_users,
            "n_batches_fed": n_batches + 1,
            "wall_sec": round(wall, 2),
            "replay_equals_batch": got == want and len(want) > 0,
            "final_state_rows": final.get("stateRowsTotal"),
            "state_rows_equals_users": final.get("stateRowsTotal") == n_users,
            "final_state_mem_bytes": final.get("stateMemBytes"),
            "state_bytes_per_key": (
                round(final["stateMemBytes"] / n_users, 1)
                if final.get("stateMemBytes") and n_users
                else None
            ),
            "batches": batches,
        }
        print(json.dumps(out))
        return 0 if out["replay_equals_batch"] else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
