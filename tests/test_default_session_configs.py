"""The r3 driver-only hash mismatches were invisible to the local
harness because it pins session configs (UTC, shuffle partitions, AQE)
that an external harness may not. Regression: the four formerly-red
queries must value-match DuckDB EXACTLY (17 significant digits, not the
sweep's 6dp) under a bone-stock SparkSession in a FRESH JVM — no UTC
pin, default 200 shuffle partitions, default ANSI — via
scripts/repro_r3_fails.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_former_red_queries_exact_under_bone_stock_session():
    r = subprocess.run(
        [sys.executable, "scripts/repro_r3_fails.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=540,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-1500:])
    assert "DIFF" not in r.stdout, r.stdout[-3000:]
