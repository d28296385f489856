"""Skew contract for the sliding-window rate limiter (r8).

The r8 skew5m probe caught the definitional plan pathology: Spark's
SlidingWindowFunctionFrame re-aggregates the whole in-frame buffer for
every output row once rows leave the frame, so a bounded trailing
RANGE-frame count is O(rows x in-window rows) PER KEY — a 2.5M-event
hot user pinned one executor core for >30 min on one micro-batch. And
a hot key is this operator's operating regime: rate limiters exist
because of abusive keys. Both the batch plan and the streaming twin's
Python fold were rewritten to linear forms:

- batch (rel_rate_limit_audit): +n/-n difference stream with a running
  UNBOUNDED PRECEDING sum (the one frame Spark evaluates incrementally)
  read out at instant positions;
- streaming (stateful_rate_limit): two-pointer sliding window with a
  running total over the time-ordered arrivals.

These tests pin (1) the batch plan SHAPE — no bounded RangeFrame may
reappear — and (2) hot-key VALUE equality of batch vs oracle-semantics
reference on a fixture where one user owns 90% of events with dense
same-instant peers (the regime the r8 probe measured; full-scale
replay==batch evidence: STREAM_STATE_skew5m_r8_ratelimit.json).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark import plans
from mrc_spark_jobs_pubmed_spark.plans.timeseries_queries import (
    RATE_LIMIT_K,
    RATE_WINDOW_S,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_rate_limit_plan_has_no_bounded_range_frame(spark):
    df = plans.get("rel_rate_limit_audit").fn(spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "RangeFrame" not in plan, (
        "rel_rate_limit_audit regressed to a bounded RANGE frame — "
        "Spark re-aggregates the whole frame per row once rows leave "
        "it (O(n x window) on a hot key); keep the difference-stream "
        "form (see r8 jstack receipt in PERF.md)"
    )
    # the running sum must be the incremental unbounded-preceding frame
    assert "unboundedpreceding" in plan.lower()


def test_rate_limit_hot_key_values(spark, tmp_path):
    """One user owns 90% of events, arrivals bursty with same-instant
    peers; compare the difference-stream plan against an independent
    per-event reference computed straight from the window definition:
    win_n(e) = # arrivals of the user in (t_e - W, t_e]."""
    t0 = datetime.datetime(2024, 1, 1)
    w_us = RATE_WINDOW_S * 1_000_000
    rows = []
    # hot user 7: 900 events, 3 per instant (peers), instants 40 min
    # apart so the 12 h window holds 18 instants = 54 events
    for i in range(900):
        ts = t0 + datetime.timedelta(minutes=40 * (i // 3))
        rows.append((i, ts, 7, ["view", "click"][i % 2], 1.0, "{}"))
    # cold users 1..100: one event each
    for u in range(1, 101):
        ts = t0 + datetime.timedelta(minutes=13 * u)
        rows.append((10_000 + u, ts, u, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)

    got = {
        tuple(r)
        for r in plans.get("rel_rate_limit_audit")
        .fn(spark, str(tmp_path))
        .collect()
    }

    # independent reference: brute-force per event in local python
    evs = [(int(e), ts, int(u), ty) for e, ts, u, ty, _v, _p in rows]
    by_user: dict[int, list[int]] = {}
    for _e, ts, u, _ty in evs:
        by_user.setdefault(u, []).append(
            int(ts.timestamp() * 1_000_000)
        )
    agg: dict[str, list] = {}
    for _e, ts, u, ty in evs:
        t_us = int(ts.timestamp() * 1_000_000)
        win_n = sum(
            1 for s in by_user[u] if t_us - w_us < s <= t_us
        )
        a = agg.setdefault(ty, [0, 0, set(), 0])
        a[0] += 1
        if win_n > RATE_LIMIT_K:
            a[1] += 1
            a[2].add(u)
        a[3] = max(a[3], win_n)
    want = {
        (ty, a[0], a[1], len(a[2]), a[3]) for ty, a in agg.items()
    }
    assert got == want


def test_rate_limit_same_instant_peers_share_count(spark, tmp_path):
    """All arrivals at one microsecond are peers sharing one count —
    the order-independence contract that makes the result exact on
    any partitioning (and lets streaming replay equal batch)."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = [(i, t0, 5, "view", 1.0, "{}") for i in range(4)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    got = (
        plans.get("rel_rate_limit_audit").fn(spark, str(tmp_path)).collect()
    )
    assert [tuple(r) for r in got] == [("view", 4, 4, 1, 4)]
