"""Deterministic scale-up of the driver fixtures: sf0.1 -> sf1 (or any
integer factor) for benchmark scaling evidence.

The driver ships read-only parquet at sf{0.001,0.01,0.1}; the perf gate
("within 2x of DuckDB at the same sf") is dominated at sf0.1 by Spark's
fixed per-query scheduling overhead, so the scaling datapoint needs a
bigger sf. This script replicates sf0.1 K times with key offsets chosen
so that:

* star-schema join integrity holds (every replica's lineitem points at
  the same replica's orders/part/supplier; orders at customers);
* selectivity-sensitive predicates (dates, segments, priorities) keep
  their sf0.1 fractions — replication copies value distributions;
* `documents` text is word-permuted per replica (deterministic md5
  order), so replicas keep identical token statistics but do NOT become
  shingle-level near-duplicates — dedup/minhash workloads scale in doc
  count, not in artificial duplicate pairs;
* `embeddings` vectors get a tiny per-replica deterministic perturbation
  so cosine structure stays realistic without exact ties.

Usage: python scripts/gen_scale_fixtures.py [--src /root/testdata/sf0.1]
           [--dst testdata/sf1] [--factor 10]
Output is gitignored; regeneration is cheap (~1 min) and deterministic.
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb

# (table, [(key_column, shift_per_replica)]) — shifts are per-replica
# multiples of a round upper bound on the base key range so replicas
# never collide.
STAR_SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

# key-space stride per replica, by column prefix; one round constant per
# entity keeps every replica's foreign keys pointing into that replica.
STRIDE = 100_000_000


def _key_entity(col: str) -> str:
    """custkey/orderkey/... -> entity name so FK and PK shift identically."""
    return col.split("_", 1)[1]


def replicate_star(con: duckdb.DuckDBPyConnection, src: str, dst: str, factor: int):
    for table in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {table}: copied (dimension)")

    entity_stride = {}
    for cols in STAR_SHIFTS.values():
        for c in cols:
            entity_stride[_key_entity(c)] = STRIDE

    for table, key_cols in STAR_SHIFTS.items():
        base_cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
            ).fetchall()
        ]
        select_parts = []
        for c in base_cols:
            if c in key_cols:
                select_parts.append(
                    f"{c} + r.i * {entity_stride[_key_entity(c)]} AS {c}"
                )
            else:
                select_parts.append(c)
        sql = (
            f"COPY (SELECT {', '.join(select_parts)} "
            f"FROM read_parquet('{src}/{table}.parquet'), "
            f"(SELECT unnest(range({factor})) AS i) r) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        con.execute(sql)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"  {table}: {n} rows")


def replicate_documents(src: str, dst: str, factor: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{src}/documents.parquet")
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(factor):
        for j, txt in enumerate(text):
            if i == 0:
                new_txt = txt
            else:
                words = txt.split(" ")
                order = sorted(
                    range(len(words)),
                    key=lambda k: hashlib.md5(
                        f"{i}:{k}:{words[k]}".encode()
                    ).digest(),
                )
                new_txt = " ".join(words[k] for k in order)
            out["doc_id"].append(doc_id[j] + i * STRIDE)
            out["text"].append(new_txt)
            out["lang"].append(lang[j])
            out["source"].append(source[j])
            out["n_chars"].append(len(new_txt))
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    # r11 (guide §6): bounded row groups — pyarrow's default writes ONE
    # row group (1M rows / ~312 MB at sf20), and a parquet scan can only
    # split at row-group boundaries, so every documents-derived query
    # paid a single-threaded scan+decompress before fan_out() could
    # spread the CPU work (measured: a ~3-4 s straggler task under every
    # sf20 mm_/text_ stage). 100k-row groups split ~30 MB each.
    pq.write_table(
        pa.table(out, schema=schema),
        f"{dst}/documents.parquet",
        row_group_size=100_000,
    )
    print(f"  documents: {len(out['doc_id'])} rows")


def replicate_embeddings(src: str, dst: str, factor: int):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    n, d = emb.shape

    ids, vecs, labels = [], [], []
    for i in range(factor):
        ids.append(vec_id + i * STRIDE)
        if i == 0:
            vecs.append(emb)
        else:
            # deterministic sub-1e-3 perturbation: keeps neighborhoods
            # realistic, breaks exact ties between replicas
            jitter = (
                ((np.arange(d)[None, :] * 7919 + vec_id[:, None] * 104729 + i) % 97)
                - 48
            ).astype(np.float32) * 1e-4
            vecs.append(emb + jitter)
        labels.append(label)
    out = pa.table(
        {
            "vec_id": np.concatenate(ids),
            "embedding": list(np.concatenate(vecs)),
            "label": np.concatenate(labels),
        },
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    # bounded row groups for scan parallelism (see replicate_documents)
    pq.write_table(out, f"{dst}/embeddings.parquet", row_group_size=50_000)
    print(f"  embeddings: {out.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="testdata/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    print(f"scaling {args.src} x{args.factor} -> {args.dst}")
    replicate_star(con, args.src, args.dst, args.factor)
    replicate_documents(args.src, args.dst, args.factor)
    replicate_embeddings(args.src, args.dst, args.factor)
    print("done")


if __name__ == "__main__":
    raise SystemExit(main())
