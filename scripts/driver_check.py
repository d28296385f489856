"""Drive the engine exactly as the round driver does.

1. smoke: entry(spark) at sf0.001 → rows > 0, stable schema
2. correctness: each queries()[name] at sf0.01 vs oracle_sql()[name] in
   DuckDB (views pre-registered) — row count + sorted column names +
   order-insensitive value comparison.

Usage: python scripts/driver_check.py [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from mrc_spark_jobs_pubmed_spark.session import get_session

import os

SF_SMOKE = "/root/testdata/sf0.001"
# override to replay the oracle sweep at another scale (e.g. the
# regenerated testdata/sf1) — correctness should hold at every sf
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows, cols):
    def norm(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 6)
        return v

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(norm(r[i]) for i in idx) for r in rows), key=repr)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_session(app_name="driver-check", shuffle_partitions=8)

    t0 = time.time()
    res = entrymod.entry(spark)
    rows = res.collect()
    print(f"SMOKE entry(): {len(rows)} rows, schema={res.columns} ({time.time()-t0:.1f}s)")
    assert len(rows) > 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracle_sql keys not in queries: {extra}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_ORACLE)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
                n_pass += 1
                continue
            r = con.execute(oracles[name])
            dcols = [d[0] for d in r.description]
            drows = [tuple(x) for x in r.fetchall()]
            ok_cols = sorted(scols) == sorted(dcols)
            ok_count = len(srows) == len(drows)
            ok_vals = ok_cols and ok_count and canon(srows, scols) == canon(drows, dcols)
            # dtype parity mirrors the DRIVER's type-sensitive pandas
            # canonicalizer: identical VALUES still hash-mismatch when
            # e.g. a DuckDB HUGEINT sum lands as float64 against
            # Spark's int64 — the root cause of all four r3 red rows,
            # invisible to a value-only compare.
            ok_dtype = True
            dtype_msg = "ok"
            if ok_cols:
                sdt = sdf.toPandas().dtypes
                ddt = con.execute(oracles[name]).df().dtypes
                # KIND-level compare, same rule as scripts/dtype_audit:
                # r01 evidence says width (int32/int64) and unit (ns/us)
                # differences hash fine in the driver; KIND differences
                # (int vs float: HUGEINT→float64, date-object vs
                # datetime64) do not.
                bad = [
                    f"{c}: spark={sdt[c]} duckdb={ddt[c]}"
                    for c in scols
                    if sdt[c].kind != ddt[c].kind
                ]
                if bad:
                    ok_dtype = False
                    dtype_msg = "; ".join(bad)
            status = "PASS" if (ok_cols and ok_count and ok_vals and ok_dtype) else "FAIL"
            print(
                f"  {status} {name}: rows={len(srows)}/{len(drows)} "
                f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
                f"vals={'ok' if ok_vals else 'MISMATCH'} "
                f"dtypes={dtype_msg} ({time.time()-t0:.1f}s)"
            )
            n_pass += status == "PASS"
            n_fail += status == "FAIL"
        except Exception as exc:  # noqa: BLE001
            print(f"  ERROR {name}: {type(exc).__name__}: {exc}")
            n_fail += 1
    print(f"{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
