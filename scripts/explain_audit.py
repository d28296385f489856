"""Physical-plan audit across the whole query registry.

For every registered query, prints the Exchange count and any
plan-shape flags (Python evaluation nodes, cartesian products,
sort-merge vs broadcast joins). This is the "explain and iterate"
loop from the scale checklist, automated: run it after adding an
operator and justify every flag (some are intended — full outer joins
cannot broadcast, range joins against a tiny side are BNLJ by design,
scalar-count joins are 1-row BNLJ).

Usage: python scripts/explain_audit.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.01")

FLAGS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "CartesianProduct",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_session(app_name="explain-audit", shuffle_partitions=8)
    for name, q in sorted(plans.all_queries().items()):
        if only and name not in only:
            continue
        df = q.fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        hits = [f"{k}x{plan.count(k)}" for k in FLAGS if plan.count(k)]
        print(f"{name:28s} exchanges={plan.count('Exchange'):2d}  {' '.join(hits)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
