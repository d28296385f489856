"""Round-11 extension: sim_retrieval_metrics on the shared GEMM top-k stage.

The r9 negative result located sim_retrieval_metrics' cost in the
10-query cosine arithmetic itself (not the window). Round 11 built the
chunked-GEMM prune + exact-fold rescore stage for exactly that
arithmetic (S.topk_per_query_gemm, shipped in sim_batch_topk /
sim_rrf_fusion). This A/B probes reusing it here: the metrics only need
the exact per-query top-RM_K rows with their (cosine, rnk); labels are
re-attached to the ≤ RM_Q_N·RM_K ranked rows by a broadcast join
against the label projection of the same table (column-pruned scan; the
heavy 64-float vectors are NOT re-read).

Exactness: topk_per_query_gemm returns the definitional top-k rows with
definitional ranks (prefix-closed superset + bit-identical rescore —
the argument and tie tests shipped with sim_batch_topk). The metric
aggregates consume exactly those rows, and the label joins are
key-preserving (vec_id unique; every ranked vec_id exists in the
corpus), so all downstream BIGINT metrics are identical.

Usage:
  SPARK_GRAFT_SF_DIR=testdata/sf20 python scripts/r11_rm_ab.py \
      --out AB_r11_rm_sf20.json [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402
from mrc_spark_jobs_pubmed_spark.operators import similarity as S  # noqa: E402
from mrc_spark_jobs_pubmed_spark.plans.similarity_queries import (  # noqa: E402
    RM_K,
    RM_Q_N,
    _rm_idcg_case,
    _RM_W_CASE,
)
from mrc_spark_jobs_pubmed_spark.session import get_session  # noqa: E402
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table  # noqa: E402


def v_gemm(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    ranked = S.topk_per_query_gemm(emb, RM_Q_N, RM_K)
    qlab = emb.where(F.col("vec_id") < RM_Q_N).select(
        F.col("vec_id").alias("_qid"), F.col("label").alias("qlabel")
    )
    clab = emb.where(F.col("vec_id") >= RM_Q_N).select("vec_id", "label")
    lab = clab.groupBy("label").agg(
        F.count("*").cast("long").alias("n_relevant")
    )
    tagged = (
        F.broadcast(
            ranked.join(F.broadcast(qlab), ranked.qid == F.col("_qid")).drop(
                "_qid"
            )
        )
        .join(clab, "vec_id")
    )
    per_q = tagged.groupBy("qid", "qlabel").agg(
        F.sum(F.expr("CASE WHEN label = qlabel THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("hits_at_k"),
        F.max(
            F.expr(
                "CASE WHEN label = qlabel THEN 1000000000 div rnk ELSE 0 END"
            )
        )
        .cast("long")
        .alias("mrr_u9"),
        F.sum(
            F.expr(f"CASE WHEN label = qlabel THEN {_RM_W_CASE} ELSE 0 END")
        )
        .cast("long")
        .alias("dcg_u9"),
    )
    return per_q.join(F.broadcast(lab), per_q.qlabel == lab.label).select(
        "qid",
        per_q.qlabel.alias("label"),
        "n_relevant",
        "hits_at_k",
        "mrr_u9",
        "dcg_u9",
        F.expr(
            f"CAST(1000000 * dcg_u9 div {_rm_idcg_case('n_relevant')}"
            " AS LONG)"
        ).alias("ndcg_u6"),
    )


def _canon(df):
    cols = sorted(df.columns)

    def norm(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 6)
        return v

    rows = [tuple(norm(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows, key=repr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "testdata/sf20")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session(app_name="r11-rm-ab")
    q = plans.all_queries()["sim_retrieval_metrics"]

    builders = {"current": lambda s, d: q.fn(s, d), "gemm": v_gemm}

    ref = _canon(q.fn(spark, sf_dir))
    got = _canon(v_gemm(spark, sf_dir))
    check = "identical" if got == ref else "MISMATCH"
    print(f"gemm: values {check}", flush=True)

    for vn, fn in builders.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {vn: [] for vn in builders}
    for _ in range(args.runs):
        for vn, fn in builders.items():
            spark.sparkContext.setJobDescription(f"r11rm:{vn}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[vn].append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    out = {}
    for vn, ss in samples.items():
        ss.sort()
        mid = len(ss) // 2
        med = ss[mid] if len(ss) % 2 else (ss[mid - 1] + ss[mid]) / 2
        out[vn] = {"median_sec": round(med, 3), "samples": [round(x, 3) for x in ss]}
    out["gemm"]["values"] = check

    with open(args.out, "w") as f:
        json.dump(
            {
                "method": f"same-session interleaved, median of {args.runs} "
                "rounds, noop sink; value identity checked first",
                "sf": sf,
                "sf_dir": sf_dir,
                "queries": {"sim_retrieval_metrics": out},
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(json.dumps({vn: out[vn]["median_sec"] for vn in out}))
    spark.stop()


if __name__ == "__main__":
    main()
