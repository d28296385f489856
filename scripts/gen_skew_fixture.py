"""Deterministic skewed events fixture (testdata/skew5m): 5M events,
50,001 users, ONE user owning 50% of all rows — the hot-key regime the
range-sharded interval-coalesce variant and the rate-limiter state
bound exist for. Same schema and 30-day span as the driver's events
table; everything is a closed-form function of the row index, so
regeneration is bit-identical (the fixture itself is gitignored, like
the scale fixtures).

Hot user 0: 2.5M events on a regular ~1.04 s cadence (30 days / 2.5M)
— steady high-rate traffic, the worst case for trailing-window array
state (every instant distinct, maximal in-window count). Cold users
1..50000: 50 events each on a per-user interleaved cadence.

Usage: python scripts/gen_skew_fixture.py [--dst testdata/skew5m]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SPAN_US = 30 * 24 * 3600 * 1_000_000  # 30 days
N_HOT = 2_500_000
N_COLD_USERS = 50_000
COLD_PER_USER = 50
T0 = "TIMESTAMP '2024-01-01 00:00:00'"
TYPES = "['view', 'click', 'purchase', 'signup', 'error']"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", default="testdata/skew5m")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    # hot rows: i in [0, N_HOT), user 0, evenly spaced over the span
    # cold rows: j in [0, 50k*50), user 1 + j % 50k, j-th cold instant
    # offset by +521 us so no cold row collides with a hot instant
    con.execute(
        f"""
COPY (
  WITH hot AS (
    SELECT i AS event_id,
           {T0} + to_microseconds(i * ({SPAN_US} // {N_HOT})) AS ts,
           CAST(0 AS BIGINT) AS user_id,
           {TYPES}[1 + CAST(i % 5 AS INT)] AS event_type,
           CAST((i % 1000) AS DOUBLE) / 10 AS value,
           '{{}}' AS props
    FROM range({N_HOT}) t(i)
  ),
  cold AS (
    SELECT {N_HOT} + j AS event_id,
           {T0} + to_microseconds(
             j * ({SPAN_US} // {N_COLD_USERS * COLD_PER_USER}) + 521
           ) AS ts,
           CAST(1 + j % {N_COLD_USERS} AS BIGINT) AS user_id,
           {TYPES}[1 + CAST(j % 5 AS INT)] AS event_type,
           CAST((j % 1000) AS DOUBLE) / 10 AS value,
           '{{}}' AS props
    FROM range({N_COLD_USERS * COLD_PER_USER}) t(j)
  )
  SELECT * FROM hot UNION ALL SELECT * FROM cold ORDER BY ts, event_id
) TO '{args.dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    n, u = con.execute(
        f"SELECT count(*), count(DISTINCT user_id) "
        f"FROM read_parquet('{args.dst}/events.parquet')"
    ).fetchone()
    print(f"wrote {args.dst}/events.parquet: {n} rows, {u} users")


if __name__ == "__main__":
    main()
