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


def test_driver_window_covers_every_family():
    """The driver writes official CORRECTNESS rows for only the first ~50
    registered queries; assert the curated window covers every query
    family so no family ships without an official row (r01 gap)."""
    names = list(plans.all_queries())
    window = names[:50]
    families = {n.split("_")[0] for n in names}
    window_families = {n.split("_")[0] for n in window}
    assert families == window_families, (
        f"families missing from driver window: {families - window_families}"
    )
    assert "text_word_topk" in window  # flagship
    # the six r02 driver-red rows (events-ts bug, fixed in r3) must sit
    # inside the checked window so the fix gets official green rows
    for must in ("stream_tumbling_counts", "stream_sliding_avg",
                 "stream_session_windows", "stream_interval_join",
                 "stream_static_enrich", "rel_asof_join"):
        assert must in window, f"{must} outside driver window"


def test_driver_window_is_consistent():
    """DRIVER_WINDOW names must all exist (set_priority raises on typos)
    and leave headroom for the driver's 50-row cap."""
    assert len(plans.DRIVER_WINDOW) <= 50
    assert len(set(plans.DRIVER_WINDOW)) == len(plans.DRIVER_WINDOW)
