"""Scale-pressure probe for the applyInPandasWithState streaming twins
(VERDICT r6 item 4): replay the sf1 events table through a stateful
twin in K time-ordered micro-batches, record the state-store metrics
the replay tests never look at (numRowsTotal, memoryUsedBytes per
batch), and prove replay == batch at this scale.

Jobs:
- interval_coalesce: two longs (+ replay cursor) per USER — state rows
  must equal the user-key domain and memory per key stay flat across
  batches. Needs a per-user sentinel to drain the final open islands.
- queue_wait: three longs per EVENT TYPE — the few-keys regime; state
  rows must equal |event types| however many events stream through.
  Emits every event's wait as processed, so no sentinel.
- ewma: <= K trailing 1e-4 values per USER; serving row = the user's
  latest emission (max n_events), which must equal the batch query.
- burst_detection: trailing (hour, count) pairs per TYPE (<= base_h+1);
  per-type sentinel 48h out closes every real hour so decisions final.

Usage: python scripts/stream_state_probe.py [sf_dir] [n_batches] [job]
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


def _user_sentinel(ev):
    """One zero-length event per user far past the end: drains each
    user's final open island (interval_coalesce)."""
    return (
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


def _type_sentinel(ev):
    """One event per type 48h past the end: closes each type's open
    hour so burst decisions for every real hour become final."""
    return (
        ev.groupBy("event_type")
        .agg(F.max("ts").alias("mx"))
        .select(
            F.lit(10**12).cast("long").alias("event_id"),
            (F.col("mx") + F.expr("INTERVAL 48 HOURS")).alias("ts"),
            F.lit(0).cast("long").alias("user_id"),
            "event_type",
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .select([f.name for f in ev.schema.fields])
    )


def _sessions_sentinel(ev):
    """One event per user at a FIXED far timestamp (2030-01-01): the
    5-min gap closes every user's trailing real session, and the fixed
    constant lets the rollup exclude the sentinel's own open/reaped
    session deterministically (WHERE session_start < 2029) with no
    data-dependent bound."""
    return (
        ev.select("user_id")
        .distinct()
        .select(
            F.lit(10**12).cast("long").alias("event_id"),
            F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
            "user_id",
            F.lit("view").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .select([f.name for f in ev.schema.fields])
    )


def _max_inwindow_instants(ev):
    """Analytic hot-key bound for the rate limiter's array state: the
    max number of distinct arrival instants any one user keeps inside
    the trailing window at any point in the feed (= that user's state
    array length high-water mark). Computed as a +1/-1 difference
    stream with a running unbounded-preceding sum — NOT a bounded
    RANGE frame, whose per-row frame re-aggregation is O(n x window)
    on exactly the hot key this probe exists to measure."""
    from pyspark.sql import Window

    w_us = J.RATE_WINDOW_S * 1_000_000
    inst = ev.select("user_id", F.unix_micros("ts").alias("t_us")).distinct()
    diff = inst.select(
        "user_id", (F.col("t_us") + w_us).alias("tm"),
        F.lit(0).alias("pri"), F.lit(-1).alias("contrib"),
    ).unionByName(
        inst.select(
            "user_id", F.col("t_us").alias("tm"),
            F.lit(1).alias("pri"), F.lit(1).alias("contrib"),
        )
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("tm", "pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        diff.select("pri", F.sum("contrib").over(wrun).alias("cnt"))
        .where(F.col("pri") == 1)
        .agg(F.max("cnt"))
        .collect()[0][0]
    )


JOBS = {
    "sessions": {
        "twin": J.stateful_sessionize,
        "sentinel": _sessions_sentinel,
        "key_domain": lambda ev: ev.select("user_id").distinct().count(),
        # reconstruct the batch contract exactly: session_seq is the
        # per-user rank by start (sessions are disjoint), epochs floor
        # to seconds, value sums are exact 1e-4 integers in double.
        # The fixed-2030 sentinel sessions (open in state, or reaped if
        # a trailing empty micro-batch fires the timeout) are excluded
        # by the constant bound — every REAL session starts well below.
        "rollup_sql": (
            "SELECT user_id,"
            " CAST(row_number() OVER (PARTITION BY user_id"
            "   ORDER BY session_start) AS BIGINT) AS session_seq,"
            " CAST(unix_micros(session_start) div 1000000 AS BIGINT)"
            "   AS start_epoch,"
            " CAST(unix_micros(session_end) div 1000000 AS BIGINT)"
            "   AS end_epoch,"
            " n_events, value_sum"
            " FROM {view}"
            " WHERE session_start < TIMESTAMP '2029-01-01 00:00:00'"
        ),
        "batch_query": "stream_stateful_sessions",
    },
    "interval_coalesce": {
        "twin": J.stateful_interval_coalesce,
        "sentinel": _user_sentinel,
        "key_domain": lambda ev: ev.select("user_id").distinct().count(),
        # memory-sink rollup that must equal the batch query
        "rollup_sql": (
            "SELECT user_id, count(*) AS n_islands,"
            " sum(covered_us) AS covered_us, max(covered_us) AS longest_us"
            " FROM {view} GROUP BY user_id"
        ),
        "batch_query": "rel_interval_coalesce",
    },
    "queue_wait": {
        "twin": J.stateful_queue_wait,
        "sentinel": None,
        "key_domain": lambda ev: ev.select("event_type").distinct().count(),
        # mirror rel_queue_wait_lindley's exact integer readout
        "rollup_sql": (
            "SELECT event_type, count(*) AS n_jobs,"
            " sum(CASE WHEN w_us > 0 THEN 1 ELSE 0 END) AS n_delayed,"
            " CAST(max(w_us div 1000) AS BIGINT) AS max_wait_ms,"
            " CAST((2 * sum(w_us div 1000) + count(*)) div (2 * count(*))"
            "   AS BIGINT) AS avg_wait_ms"
            " FROM {view} GROUP BY event_type"
        ),
        "batch_query": "rel_queue_wait_lindley",
    },
    "ewma": {
        "twin": J.stateful_ewma,
        "sentinel": None,
        "key_domain": lambda ev: ev.select("user_id").distinct().count(),
        # update mode: the user's LATEST emission (max n_events) is the
        # serving row and must equal the batch query
        "rollup_sql": (
            "SELECT user_id, n_events, last_v_u4, ewma_u4 FROM ("
            " SELECT *, row_number() OVER (PARTITION BY user_id"
            "   ORDER BY n_events DESC) AS rn FROM {view}) WHERE rn = 1"
        ),
        "batch_query": "rel_ewma_smoothing",
    },
    "burst_detection": {
        "twin": J.stateful_burst_detection,
        "sentinel": _type_sentinel,
        "key_domain": lambda ev: ev.select("event_type").distinct().count(),
        "rollup_sql": "SELECT event_type, hour, n, base_n FROM {view}",
        "batch_query": "rel_burst_detection",
    },
    "heartbeat_gaps": {
        "twin": J.stateful_heartbeat_gaps,
        # gaps are closed by the event that ends them; the trailing open
        # silence is not a gap in the batch form either — no sentinel
        "sentinel": None,
        "key_domain": lambda ev: ev.select("user_id").distinct().count(),
        "rollup_sql": (
            "SELECT user_id, gap_start_us, gap_end_us, gap_s FROM {view}"
        ),
        "batch_query": "rel_heartbeat_gaps",
    },
    "double_fire": {
        "twin": J.stateful_double_fire,
        "sentinel": None,
        "key_domain": lambda ev: (
            ev.select("user_id", "event_type").distinct().count()
        ),
        "rollup_sql": (
            "SELECT user_id, event_type, first_event, dup_event, gap_ms,"
            " same_value FROM {view}"
        ),
        "batch_query": "rel_double_fire_events",
    },
    "rate_limit": {
        "twin": J.stateful_rate_limit,
        "sentinel": None,
        "key_domain": lambda ev: ev.select("user_id").distinct().count(),
        # the twin emits per-event decisions; the batch query is the
        # per-type audit rollup — reconstruct it exactly (win_n counts
        # all same-instant peers on both sides, so the set compare is
        # engine-exact)
        "rollup_sql": (
            "SELECT event_type, count(*) AS n_events,"
            " CAST(sum(throttled) AS BIGINT) AS n_throttled,"
            " CAST(count(DISTINCT CASE WHEN throttled = 1 THEN user_id END)"
            "   AS BIGINT) AS n_users_throttled,"
            " CAST(max(win_n) AS BIGINT) AS peak_window_count"
            " FROM {view} GROUP BY event_type"
        ),
        "batch_query": "rel_rate_limit_audit",
        # the ONE twin whose per-key state is not O(1): two parallel
        # arrays of the user's distinct arrival instants still inside
        # the trailing window. Report the analytic hot-key bound (max
        # in-window distinct instants over the whole feed) next to the
        # state-store bytes so "bounded by W x rate" is a measured
        # number, not a docstring claim.
        "extra_metrics": lambda spark, ev: {
            "max_inwindow_instants_per_key": _max_inwindow_instants(ev)
        },
    },
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    job = sys.argv[3] if len(sys.argv) > 3 else "interval_coalesce"
    spec = JOBS[job]
    spark = get_session(app_name="stream-state-probe", shuffle_partitions=32)
    ev = load_table(spark, "events", sf_dir)
    n_rows = ev.count()
    n_keys = spec["key_domain"](ev)

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
        n_fed = n_batches
        if spec["sentinel"] is not None:
            spec["sentinel"](ev).coalesce(1).write.parquet(
                f"{work}/src/t{n_batches:03d}"
            )
            n_fed += 1

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(f"{work}/src")
        )
        view = f"probe_{job}"
        t0 = time.time()
        q = (
            spec["twin"](stream)
            .writeStream.format("memory")
            .queryName(view)
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
            tuple(r) for r in spark.sql(spec["rollup_sql"].format(view=view)).collect()
        }
        want = {
            tuple(r)
            for r in plans.get(spec["batch_query"]).fn(spark, sf_dir).collect()
        }
        final = batches[-1] if batches else {}
        out = {
            "job": job,
            "sf_dir": sf_dir,
            "n_rows": n_rows,
            "n_keys": n_keys,
            "n_batches_fed": n_fed,
            "wall_sec": round(wall, 2),
            "replay_equals_batch": got == want and len(want) > 0,
            "final_state_rows": final.get("stateRowsTotal"),
            "state_rows_equals_keys": final.get("stateRowsTotal") == n_keys,
            "final_state_mem_bytes": final.get("stateMemBytes"),
            "state_bytes_per_key": (
                round(final["stateMemBytes"] / n_keys, 1)
                if final.get("stateMemBytes") and n_keys
                else None
            ),
            "batches": batches,
        }
        if spec.get("extra_metrics"):
            out.update(spec["extra_metrics"](spark, ev))
        print(json.dumps(out))
        return 0 if out["replay_equals_batch"] else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
