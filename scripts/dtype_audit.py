"""Registry-wide pandas-dtype audit of Spark query vs DuckDB oracle.

The round driver canonicalizes results through pandas and hashes values
type-sensitively: a DuckDB HUGEINT (-> float64) against a Spark BIGINT
(-> int64) hash-mismatches on identical values (r01: corpus_pack_greedy).
This audit converts BOTH sides of every oracle-checked query to pandas at
sf0.01 and reports any column whose dtype differs, plus any object-dtype
column holding unhashable (list) cells — the two failure modes the
driver's comparator has.

Usage: python scripts/dtype_audit.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_session(app_name="dtype-audit", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spdf = qs[name](spark, SF).toPandas()
        dpdf = con.execute(oracles[name]).df()
        bad = []
        for col in sorted(spdf.columns):
            s, d = spdf[col].dtype, dpdf[col].dtype
            # r01 evidence: width (int32/int64) and unit (ns/us) diffs hash
            # fine; KIND diffs (int vs float: HUGEINT->float64) do not.
            if s.kind != d.kind:
                bad.append(f"{col}: spark={s} duckdb={d}")
            elif str(s) == "object":
                cell = next((v for v in spdf[col] if v is not None), None)
                if isinstance(cell, (list, dict, set)):
                    bad.append(f"{col}: unhashable {type(cell).__name__} cells")
        if bad:
            n_bad += 1
            print(f"DTYPE-MISMATCH {name}: {'; '.join(bad)}")
        else:
            print(f"  ok {name}")
    print(f"{n_bad} queries with dtype mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
