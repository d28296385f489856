"""Every registered query must survive a fully EMPTY fixture set — the
incremental-run-with-no-new-data state every production pipeline hits.
Empty input must produce an empty (or empty-stats) result, never an
abort: a divide-by-zero or a fit-on-nothing in one query takes down a
whole scheduled run."""

from __future__ import annotations

import os

import pytest

from mrc_spark_jobs_pubmed_spark import plans
from mrc_spark_jobs_pubmed_spark.sources import catalog


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for name, schema in catalog.TABLE_SCHEMAS.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            os.path.join(str(d), f"{name}.parquet")
        )
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, q in sorted(plans.all_queries().items()):
        try:
            q.fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting a failure report
            failures.append(f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:110]}")
    assert not failures, "queries aborting on empty input:\n" + "\n".join(failures)
