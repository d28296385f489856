"""Reproduce the 4 CORRECTNESS_r03 hash mismatches under a bone-stock
SparkSession (the driver builds its own session, not ours — so no UTC
pin, no shuffle-partition pin, no legacy nanos flag).

Usage: python scripts/repro_r3_fails.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, ".")

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
FOUR = [
    "text_bpe_merges",
    "rel_skew_salted_join",
    "graph_pagerank",
    "stream_chained_rollup",
    # round-4b: the unrounded-double contract queries — their oracles
    # must CAST to DOUBLE (a bare `* 1.0` types as DECIMAL in DuckDB,
    # whose exact product + single sqrt rounding diverges from the
    # double path by 1 ulp; caught by this harness)
    "rel_ts_correlation",
    "emb_label_centroid_drift",
]


def canon(rows, cols, ndigits=6):
    def norm(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, ndigits)
        return v

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(norm(r[i]) for i in idx) for r in rows), key=repr)


def main() -> int:
    names = sys.argv[1:] or FOUR
    from pyspark.sql import SparkSession

    # Bone-stock: exactly what an external harness would build.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("repro")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    print("session tz:", spark.conf.get("spark.sql.session.timeZone"))
    print("shuffle:", spark.conf.get("spark.sql.shuffle.partitions"))
    print("ansi:", spark.conf.get("spark.sql.ansi.enabled"))

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    rc = 0
    for name in names:
        sdf = qs[name](spark, SF)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
        r = con.execute(oracles[name])
        dcols = [d[0] for d in r.description]
        drows = [tuple(x) for x in r.fetchall()]
        cs, cd = canon(srows, scols), canon(drows, dcols)
        exact_cs = canon(srows, scols, ndigits=17)
        exact_cd = canon(drows, dcols, ndigits=17)
        ok6 = cs == cd
        okx = exact_cs == exact_cd
        print(f"{name}: rows {len(srows)}/{len(drows)} 6dp={'OK' if ok6 else 'DIFF'} exact={'OK' if okx else 'DIFF'}")
        if not okx:
            rc = 1
            shown = 0
            for a, b in zip(exact_cs, exact_cd):
                if a != b and shown < 8:
                    print("  spark :", a)
                    print("  oracle:", b)
                    shown += 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
