"""Structured Streaming jobs over the events stream (SURVEY.md §2
streaming-only block).

The reference has no streaming; its closest analogue is the idempotent
skip-if-exists resume loop (A5), which Structured Streaming's checkpoint +
exactly-once file sink subsumes. Each job here is a transformation from a
streaming DataFrame to a streaming DataFrame, so the SAME function body
runs in batch mode for the DuckDB oracle (plans/streaming_queries.py) and
in streaming mode under a watermark — one definition, two runtimes.

File-source replay of events.parquet drives deterministic tests
(tests/test_streaming.py): `format("memory")` + `processAllAvailable()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.sources.catalog import events_read_plan

WATERMARK = "10 minutes"
TUMBLE = "5 minutes"
SLIDE_SIZE = "10 minutes"
SLIDE_STEP = "5 minutes"
SESSION_GAP = "5 minutes"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table as a stream.

    maxFilesPerTrigger=1 gives deterministic micro-batch replay in tests;
    on a real deployment the source would be Kafka/files-in-arrival with
    the same downstream plan.
    """
    # The file source requires a directory; pathGlobFilter narrows the
    # listing to the events table within the fixture dir. The read schema
    # (and whether a ns→µs truncation is needed) comes from the parquet
    # footer via events_read_plan, same as the batch loader.
    schema, needs_ns_conversion = events_read_plan(sf_dir)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if needs_ns_conversion:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def value_micro() -> "F.Column":
    """events.value as exact BIGINT micro-units (1e-4).

    The fixture's values carry <= 4 decimal places, so the per-row
    round-to-int is exact and the SUM is an integer on any engine and
    any partitioning — round(sum(double), 4) diverged at sf1, where
    window groups grow large enough for float accumulation order to
    flip the 4th decimal (caught by the sf1 oracle sweep)."""
    return F.round(F.col("value") * 10000).cast("long")


def tumbling_counts(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """Tumbling 5-minute windows per event_type: count + value sum."""
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return (
        src.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_micro()) / 10000.0, 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_avg(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes: per-window avg value."""
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return (
        src.groupBy(F.window("ts", SLIDE_SIZE, SLIDE_STEP).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(value_micro()).alias("_sum_micro"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n",
            # ALL-INTEGER mean: (2s + n) div 2n is round-half-up of s/n
            # in micro-units (values are non-negative). Spark's round()
            # rounds the double's SHORTEST DECIMAL string while DuckDB
            # rounds the binary value, so any mean landing exactly on
            # x.xxxx5 diverges (58 windows did at sf1); integer
            # arithmetic never rounds a float at all. Spark's avg() is
            # also out: it accumulates integral input in DOUBLE, which
            # re-introduces order dependence.
            (
                F.expr("(2 * _sum_micro + n) div (2 * n)").cast("double") / 10000.0
            ).alias("avg_value"),
        )
    )


def session_windows(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap."""
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return (
        src.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_micro()) / 10000.0, 4).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def chained_window_rollup(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """Chained windowed aggregation: 5-minute tumbling counts rolled up
    into 15-minute windows (total events, peak 5-min sub-window, number
    of live sub-windows) per event_type.

    Uses `window_time()` over the first aggregation's window column —
    the Spark 3.5+ chained-time-window feature, which lets a streaming
    query stack windowed aggs without an intermediate sink. All outputs
    are integers, so the rollup is summation-order-independent and
    value-checkable across engines. In streaming, each level keeps its
    own bounded state under the same watermark; the coarse level's
    input is one row per (5-min window, type) — tiny regardless of
    event volume, which is exactly why rollups chain this way at scale
    instead of re-aggregating the raw stream twice.
    """
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    lvl1 = src.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type").agg(
        F.count("*").alias("n")
    )
    return (
        lvl1.groupBy(
            F.window(F.window_time("w"), "15 minutes").alias("w2"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.max("n").alias("peak_5min_n"),
            F.count("*").alias("n_subwindows"),
        )
        .select(
            # Epoch seconds, not a timestamp object: integer outputs are
            # immune to session-timezone / datetime-canonicalization
            # differences between collection harnesses.
            F.unix_timestamp(F.col("w2.start")).alias("wstart_epoch"),
            "event_type",
            "n_events",
            "peak_5min_n",
            "n_subwindows",
        )
    )


def dedup_events(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """Streaming dedup on event_id under the watermark (state is bounded
    by the watermark horizon — the streaming form of exact dedup)."""
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return src.dropDuplicates(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DataFrame to completion against a memory sink.

    Returns the started query; caller does processAllAvailable() + stop().
    """
    return (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )


def run_to_files(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """Durable streaming sink: file output + checkpoint.

    This is the engine's form of the reference's skip-if-exists resume
    (A5, job_pubmed_submit.py:41-43): the checkpoint records committed
    batches, so restarting the same query against the same checkpoint
    writes nothing twice — exactly-once file output without per-object
    existence checks. `available_now` drains all available input then
    stops (the batch-replay trigger); pass False for a continuous query.
    """
    writer = (
        stream_df.writeStream.outputMode("append")
        .format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def click_view_interval_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each click joined to same-user views
    within the preceding 10 minutes.

    Both sides carry watermarks and the join condition bounds event time
    on both ends, so state is provably finite — Spark evicts outlived
    rows instead of buffering streams forever. Works identically on a
    batch DataFrame (the oracle-able form) and two streaming readers.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    return clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES")),
    ).select("click_id", "view_id", "c_user", "click_ts", "view_ts")


def click_view_interval_left_join(events: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, with its
    matching same-user views in the preceding 10 minutes — or NULLs if
    none arrived.

    Outer stream-stream joins need watermarks on BOTH sides plus the
    two-sided time bound: a left row can only be emitted as unmatched
    once the watermark proves no matching right row can still arrive,
    so the NULL-extension itself is watermark-gated state eviction.
    Same body runs in batch (the oracle-able form) and as two streams.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    return clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).select("click_id", "view_id", "c_user", "click_ts", "view_ts")


def enriched_nation_counts(
    events: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    with_watermark: bool = True,
) -> DataFrame:
    """Stream-static enrichment: events joined to the (static) customer→
    nation dimension, then tumbling-windowed per nation.

    The dimension side is bounded and slowly-changing, so it broadcasts —
    the stream never shuffles for the join, and each micro-batch pays
    only the windowed aggregation. The same plan body serves batch
    (with_watermark=False) and stream.
    """
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    return (
        src.join(F.broadcast(dim), src.user_id == dim.c_custkey)
        .groupBy(F.window("ts", TUMBLE).alias("w"), "n_name")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_micro()) / 10000.0, 4).alias("value_sum"),
        )
        .select(F.col("w.start").alias("wstart"), "n_name", "n", "value_sum")
    )


# --- windowed top-k (foreachBatch post-ranking) -----------------------------

TOPK_K = 3


def windowed_type_counts(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """Tumbling 5-minute event_type counts — the streamable half of the
    windowed top-k job (pure windowed agg, bounded state)."""
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return (
        src.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n")
    )


def rank_topk(counts: DataFrame, k: int = TOPK_K) -> DataFrame:
    """Rank the windowed counts: top-k event types per window, ties
    broken by event_type for determinism."""
    from pyspark.sql import Window

    w = Window.partitionBy("wstart").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("wstart", "event_type", "n", "rnk")
    )


def run_topk_to_files(
    stream_counts: DataFrame, path: str, checkpoint: str, k: int = TOPK_K
):
    """Streaming windowed top-k via foreachBatch: rank-over-aggregate is
    not expressible inside a single streaming query (window functions
    cannot stack on a streaming agg), so the production pattern is the
    aggregation running incrementally in the stream and the (tiny) rank
    applied per micro-batch over the maintained aggregate, overwriting
    the serving copy. State stays bounded by the windowed agg; the
    foreachBatch input is one row per (window, type) — aggregate volume,
    not event volume — so the per-batch rank is always small.
    """

    def _emit(batch_df: DataFrame, _batch_id: int) -> None:
        rank_topk(batch_df, k).write.mode("overwrite").parquet(path)

    return (
        stream_counts.writeStream.outputMode("complete")
        .foreachBatch(_emit)
        .option("checkpointLocation", checkpoint)
        .start()
    )
