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


def test_driver_window_is_derived_from_official_rows():
    """Round-5 structural fix (VERDICT r4 item 1): DRIVER_WINDOW is
    derived — exactly the set of registered queries with NO official
    CORRECTNESS_r*.json row, in curated-queue-then-registration order,
    and queries() leads with it. A new register() call lands in the
    window automatically; a hand-edit that drops a never-official query
    fails here."""
    official = plans._official_rows()
    names = list(plans.all_queries())

    never_official = [n for n in names if n not in official]
    assert set(plans.DRIVER_WINDOW) == set(never_official), (
        "window/never-official divergence: "
        f"missing={sorted(set(never_official) - set(plans.DRIVER_WINDOW))} "
        f"stale={sorted(set(plans.DRIVER_WINDOW) - set(never_official))}"
    )
    # the driver samples the first ~50 of queries(): the window must be
    # the registry prefix, duplicate-free
    assert names[: len(plans.DRIVER_WINDOW)] == plans.DRIVER_WINDOW
    assert len(set(plans.DRIVER_WINDOW)) == len(plans.DRIVER_WINDOW)
    # curated queue entries must all still exist (catches renames)
    assert not [n for n in plans._ROTATION_QUEUE if n not in names]
    # verdict-r5 lead rows head the window (when still unofficial)
    lead = [n for n in plans._WINDOW_LEAD if n not in official]
    assert plans.DRIVER_WINDOW[: len(lead)] == lead


def test_survey_rows_all_backed():
    """VERDICT r5 item 7: every SURVEY.md §2 row must map to >=1 registered
    query (or an existing pytest file, for sink/source/streaming-twin
    components whose contract is unit/replay tests). Parsed from SURVEY.md
    so a new survey row cannot land without its operator, and a renamed
    query cannot orphan a survey row."""
    import os

    from mrc_spark_jobs_pubmed_spark.plans.survey_map import SURVEY_MAP

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = open(os.path.join(repo, "SURVEY.md")).read().splitlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("## 2."))
    end = next(i for i, l in enumerate(lines) if l.startswith("## 3."))
    headers = {"#", "Operator", "Op", "Family", "Kind"}
    rows = []
    for l in lines[start:end]:
        if not l.startswith("|"):
            continue
        first = l.strip("|").split("|")[0].strip()
        if not first or first in headers or set(first) <= set("- :"):
            continue
        rows.append(first)
    assert len(rows) >= 242, f"SURVEY §2 shrank? parsed {len(rows)} rows"

    registered = set(plans.all_queries())
    missing_map = [r for r in rows if r not in SURVEY_MAP]
    assert not missing_map, f"SURVEY §2 rows with no map entry: {missing_map}"
    for label, backing in SURVEY_MAP.items():
        if isinstance(backing, str):
            assert backing.startswith("pytest:"), f"{label}: bad marker {backing}"
            path = backing.split(":", 1)[1]
            assert os.path.exists(os.path.join(repo, path)), (
                f"{label}: pytest marker file {path} missing"
            )
        else:
            assert backing, f"{label}: empty query list"
            unknown = [q for q in backing if q not in registered]
            assert not unknown, f"{label}: unregistered queries {unknown}"
    # map hygiene: no stale entries for rows that left the survey
    stale = [k for k in SURVEY_MAP if k not in set(rows)]
    assert not stale, f"survey_map entries with no SURVEY §2 row: {stale}"


def test_official_rows_count_only_green(tmp_path, monkeypatch):
    """VERDICT r5 item 2: a RED official row must NOT count as official —
    the query has to re-enter the rotation for an official retest instead
    of silently leaving the window forever. Synthetic red-row fixture."""
    import json

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    red_hash = dict(green, hash_match=False)
    red_rows = dict(green, rows_match=False)
    red_err = dict(green, err="boom")
    rows_only_green = {"rows_match": True, "schema_match": True,
                       "spark_rows": 3, "err": None}  # no hash key: weaker check

    fixture = tmp_path / "CORRECTNESS_r99.json"
    fixture.write_text(json.dumps({
        "q_green": green,
        "q_red_hash": red_hash,
        "q_red_rows": red_rows,
        "q_red_err": red_err,
        "q_rows_only": rows_only_green,
        "q_malformed": "not-a-dict",
    }))

    monkeypatch.setattr(plans._glob, "glob", lambda pat: [str(fixture)])
    seen = plans._official_rows()
    assert seen == {"q_green", "q_rows_only"}

    # unit checks on the row predicate itself
    assert plans._row_is_green(green)
    assert plans._row_is_green(rows_only_green)
    assert not plans._row_is_green(red_hash)
    assert not plans._row_is_green(red_rows)
    assert not plans._row_is_green(red_err)
    assert not plans._row_is_green("not-a-dict")
