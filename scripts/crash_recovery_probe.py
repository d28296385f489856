"""Crash-recovery probe (VERDICT r7 item 5): kill a running streaming
job with a HARD process death mid-feed (os._exit — no JVM shutdown, no
checkpoint finalization), restart from the same checkpoint in a fresh
process, finish the feed, and assert the final output equals BOTH the
clean single-run answer and the batch query. Every prior streaming
claim was replay==batch under clean sequential feeds; this exercises
the restart boundary itself.

Covers the two state machineries:

- ``interval_coalesce`` — applyInPandasWithState (engine-checkpointed
  state store), output collected restart-safely via foreachBatch
  writing each micro-batch to ``out/b{batch_id}`` with overwrite: a
  re-executed uncommitted batch replaces its own directory, so
  at-least-once re-execution cannot duplicate rows.
- ``bitmap_distinct`` — run_bitmap_distinct_to_files (foreachBatch +
  versioned parquet state): the OR-merge whose at-least-once
  idempotency claim was previously argued from algebra (OR is
  idempotent) and tested for double-delivery, but never exercised
  across a real restart.

The probe records the micro-batch ids committed before the kill and the
first batch id processed after restart, so the artifact SHOWS whether a
batch was genuinely re-executed across the boundary.

Usage:
  python scripts/crash_recovery_probe.py all [sf_dir] [job] [kill_after]
  python scripts/crash_recovery_probe.py crash WORKDIR JOB KILL_AFTER
  python scripts/crash_recovery_probe.py resume WORKDIR SF_DIR JOB
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_BATCHES = 8


def _prepare(spark, ev, workdir: str) -> None:
    from pyspark.sql import functions as F

    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / N_BATCHES
    for i in range(N_BATCHES):
        cond = (F.col("ts") >= F.lit(lo + i * span)) & (
            (F.col("ts") <= F.lit(hi))
            if i == N_BATCHES - 1
            else (F.col("ts") < F.lit(lo + (i + 1) * span))
        )
        ev.where(cond).coalesce(1).write.parquet(f"{workdir}/src/t{i:03d}")
    # sentinel drains each user's final open island (interval_coalesce;
    # harmless extra events for the bitmap job)
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
    sent.coalesce(1).write.parquet(f"{workdir}/src/t{N_BATCHES:03d}")


def _start(spark, ev_schema, workdir: str, job: str, tag: str):
    """Build the streaming query for `job` under workdir/{tag} dirs."""
    from mrc_spark_jobs_pubmed_spark.streaming import jobs as J

    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(f"{workdir}/src")
    )
    ckpt = f"{workdir}/{tag}_ckpt"
    if job == "interval_coalesce":
        out_dir = f"{workdir}/{tag}_out"

        def sink(bdf, bid):
            bdf.write.mode("overwrite").parquet(f"{out_dir}/b{bid:05d}")

        return (
            J.stateful_interval_coalesce(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
    if job == "bitmap_distinct":
        return J.run_bitmap_distinct_to_files(
            stream, f"{workdir}/{tag}_serving", ckpt
        )
    raise ValueError(job)


def _final_rows(spark, workdir: str, job: str, tag: str) -> set:
    from pyspark.sql import functions as F  # noqa: F401

    if job == "interval_coalesce":
        df = spark.read.option("recursiveFileLookup", "true").parquet(
            f"{workdir}/{tag}_out"
        )
        df.createOrReplaceTempView(f"cr_{tag}")
        return {
            tuple(r)
            for r in spark.sql(
                "SELECT user_id, count(*) AS n_islands,"
                " sum(covered_us) AS covered_us,"
                " max(covered_us) AS longest_us"
                f" FROM cr_{tag} GROUP BY user_id"
            ).collect()
        }
    return {
        tuple(r)
        for r in spark.read.parquet(f"{workdir}/{tag}_serving").collect()
    }


def _batch_rows(spark, sf_dir: str, job: str) -> set:
    from mrc_spark_jobs_pubmed_spark import plans
    from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table
    from mrc_spark_jobs_pubmed_spark.streaming import jobs as J

    if job == "interval_coalesce":
        return {
            tuple(r)
            for r in plans.get("rel_interval_coalesce").fn(spark, sf_dir).collect()
        }
    # sentinel events participate in the streaming run, so the batch
    # reference includes them the same way (the feed files live under
    # src/tNNN/ — recursive lookup, like every other reader here)
    sent_day_words = J.bitmap_words(
        spark.read.option("recursiveFileLookup", "true").parquet(
            f"{_WORK['dir']}/src"
        )
    )
    return {tuple(r) for r in J.bitmap_distinct_rollup(sent_day_words).collect()}


_WORK: dict = {}


def crash(workdir: str, job: str, kill_after: int) -> None:
    from mrc_spark_jobs_pubmed_spark.session import get_session

    spark = get_session(app_name="crash-probe", shuffle_partitions=8)
    schema = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{workdir}/src"
    ).schema
    q = _start(spark, schema, workdir, job, "crashed")
    seen: list[int] = []
    while True:
        time.sleep(0.3)
        for p in q.recentProgress:
            bid = p["batchId"]
            if p.get("numInputRows") and bid not in seen:
                seen.append(bid)
        # persist what we witnessed BEFORE dying — survives os._exit
        with open(f"{workdir}/crash_meta.json", "w") as f:
            json.dump({"committed_batches_seen": sorted(seen)}, f)
        if len(seen) >= kill_after:
            os._exit(9)  # hard death: no q.stop(), no JVM shutdown


def resume(workdir: str, sf_dir: str, job: str) -> None:
    from mrc_spark_jobs_pubmed_spark.session import get_session
    from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

    _WORK["dir"] = workdir
    spark = get_session(app_name="crash-probe-resume", shuffle_partitions=8)
    ev = load_table(spark, "events", sf_dir)
    schema = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{workdir}/src"
    ).schema

    t0 = time.time()
    q = _start(spark, schema, workdir, job, "crashed")  # same checkpoint
    q.processAllAvailable()
    resumed_ids = [
        p["batchId"] for p in q.recentProgress if p.get("numInputRows")
    ]
    q.stop()
    resume_wall = time.time() - t0

    # clean reference run: same feed, fresh checkpoint, one process
    q2 = _start(spark, schema, workdir, job, "clean")
    q2.processAllAvailable()
    q2.stop()

    crash_meta = json.load(open(f"{workdir}/crash_meta.json"))
    recovered = _final_rows(spark, workdir, job, "crashed")
    clean = _final_rows(spark, workdir, job, "clean")
    batch = _batch_rows(spark, sf_dir, job)

    pre = crash_meta["committed_batches_seen"]
    out = {
        "job": job,
        "sf_dir": sf_dir,
        "n_feed_files": N_BATCHES + 1,
        "batches_before_kill": pre,
        "first_batch_after_restart": min(resumed_ids) if resumed_ids else None,
        # progress events fire post-commit, so the in-flight batch at
        # kill time is max(pre)+1: resuming exactly there proves no
        # committed batch was repeated and no offset was skipped, and
        # the interrupted batch (partially-written output/state is
        # likely — the kill lands mid-batch) was re-executed
        # idempotently.
        "resumed_at_boundary": bool(
            resumed_ids and pre and min(resumed_ids) == max(pre) + 1
        ),
        "resume_wall_sec": round(resume_wall, 2),
        "recovered_equals_clean": recovered == clean and len(clean) > 0,
        "recovered_equals_batch": recovered == batch and len(batch) > 0,
        "n_rows_recovered": len(recovered),
    }
    print(json.dumps(out))
    sys.exit(
        0 if out["recovered_equals_clean"] and out["recovered_equals_batch"] else 1
    )


def main() -> None:
    mode = sys.argv[1]
    if mode == "crash":
        crash(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    elif mode == "resume":
        resume(sys.argv[2], sys.argv[3], sys.argv[4])
    elif mode == "all":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "testdata/sf1"
        job = sys.argv[3] if len(sys.argv) > 3 else "interval_coalesce"
        kill_after = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        workdir = tempfile.mkdtemp(prefix="crash_probe_")
        try:
            from mrc_spark_jobs_pubmed_spark.session import get_session
            from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table

            spark = get_session(app_name="crash-probe-prep", shuffle_partitions=8)
            _prepare(spark, load_table(spark, "events", sf_dir), workdir)
            spark.stop()

            me = os.path.abspath(__file__)
            p = subprocess.run(
                [sys.executable, me, "crash", workdir, job, str(kill_after)],
                timeout=900,
            )
            assert p.returncode == 9, f"crash phase exited {p.returncode}, not 9"
            p = subprocess.run(
                [sys.executable, me, "resume", workdir, sf_dir, job],
                timeout=1800,
            )
            sys.exit(p.returncode)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
