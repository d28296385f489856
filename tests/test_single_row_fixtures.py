"""Every registered query must survive SINGLE-ROW tables — the n=1
degenerate state (first record of an incremental load, heavy-filter
survivors): windows with one row, k-means with fewer points than
centroids, variance/pair denominators at n(n-1)=0, joins with no
referential matches. try_divide-style NULLs are fine; aborts are not.
Also exercises re-loading tables the engine itself wrote (Spark's
INT96 timestamps through the footer sniffer)."""

from __future__ import annotations

import os

import pytest

from mrc_spark_jobs_pubmed_spark import plans
from mrc_spark_jobs_pubmed_spark.sources import catalog

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def one_row_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("one_row_sf")
    for name in catalog.TABLE_SCHEMAS:
        catalog.load_table(spark, name, SRC).limit(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(str(d), f"{name}.parquet"))
    return str(d)


def test_every_query_survives_single_row_tables(spark, one_row_sf_dir):
    failures = []
    for name, q in sorted(plans.all_queries().items()):
        try:
            q.fn(spark, one_row_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting a failure report
            failures.append(
                f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:110]}"
            )
    assert not failures, "queries aborting on n=1 input:\n" + "\n".join(failures)
