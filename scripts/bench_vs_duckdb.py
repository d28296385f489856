"""Head-to-head wall-clock: engine vs DuckDB on the headline queries.

BASELINE.md table 2 defines the perf gate as "each declared query within
2x of baseline runtime at the same sf", with DuckDB 1.x wall-clock as
the comparator. This script produces that comparison directly: for every
headline query with an oracle, time the Spark plan (steady-state, noop
sink) and the DuckDB oracle SQL (fetchall) at $SPARK_GRAFT_SF_DIR.

Prints one JSON line:
  {"sf": .., "queries": {name: {"spark_sec": s, "duckdb_sec": d,
                                "ratio": s/d}}, "within_2x": [...]}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import HEADLINE, SF_DIR  # noqa: E402
from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    # same small-sf AQE sizing as bench.py (see comment there)
    spark = get_session(
        app_name="bench-vs-duckdb",
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    registry = plans.all_queries()
    names = sys.argv[1:] or list(HEADLINE)
    out: dict[str, dict[str, float]] = {}
    for name in names:
        q = registry[name]
        # Timed region = plan build + execute: queries that materialize
        # intermediates eagerly (localCheckpoint — pagerank, PQ-ADC,
        # doc-sim, BPE, cluster components) do real work inside fn(),
        # and timing only the final write would hide it. For plain
        # queries fn() is plan construction only (milliseconds), so
        # this accounting changes nothing for them.
        q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark_sec = time.time() - t0

        duck_sec = None
        if q.oracle:
            con.execute(q.oracle).fetchall()  # warm
            t0 = time.time()
            con.execute(q.oracle).fetchall()
            duck_sec = time.time() - t0
        out[name] = {
            "spark_sec": round(spark_sec, 3),
            "duckdb_sec": round(duck_sec, 3) if duck_sec is not None else None,
            "ratio": round(spark_sec / duck_sec, 2) if duck_sec else None,
        }

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    print(
        json.dumps(
            {
                "sf": float(m.group(1)) if m else None,
                "queries": out,
                "within_2x": [
                    n for n, v in out.items() if v["ratio"] is not None and v["ratio"] <= 2
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
