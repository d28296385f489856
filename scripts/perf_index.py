"""PERF evidence index + adjudications table (VERDICT r7 item 1).

One generated artifact answering, for EVERY registered query: what is
its largest-scale measured datapoint (sf, spark_sec, duckdb_sec, ratio,
source file), or — when the comparator cannot run or the contract makes
the comparison structurally unfair — which standing adjudication covers
it. The pytest gate (tests/test_perf_index_gate.py) fails whenever a
registry row has neither, whenever an adjudication references a query
that no longer exists, or whenever the committed PERF_INDEX.json is
stale relative to the PERF_*.json evidence on disk — the perf sibling
of tests/test_ritual_gate.py.

Classification (priority order, mechanical):

1. ``adjudicated`` — the query is in ADJUDICATIONS below (hand-curated,
   each with the citation trail the ruling was made under). A measured
   datapoint, when one exists (e.g. spark-only absolutes for the
   comparator-kill class), is attached alongside, never discarded.
2. ``measured-ok`` — ratio <= 2.0 vs DuckDB at the largest measured
   scale (datapoints below SF_FLOOR don't count: sub-sf1 runs are
   bench smoke, not scale evidence).
3. ``fixed-overhead`` (auto) — ratio > 2 but the Spark absolute at the
   largest measured scale is <= FIXED_OVERHEAD_SEC: the reading is the
   session/scheduling floor against a near-instant comparator, not a
   scale defect (the VERDICT r6/r7 collapsed-domain ruling, applied as
   a rule instead of a prose list).
4. ``weak`` — ratio > 2 with a material absolute. NOT a gate failure
   (the gate demands evidence, not victory) but listed first in
   PERF_INDEX.md as the round's open perf work items.
5. ``UNCLASSIFIED`` — no datapoint, no adjudication. Gate FAILS.

Usage: python scripts/perf_index.py [--check]
  writes PERF_INDEX.json + PERF_INDEX.md at the repo root;
  --check exits 1 if the committed JSON differs from a fresh build.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mrc_spark_jobs_pubmed_spark import plans  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

SF_FLOOR = 1.0
FIXED_OVERHEAD_SEC = 2.5
RATIO_GATE = 2.0

# --- standing adjudications -------------------------------------------------
# Each ruling was made (and re-affirmed) by a round judge; the cite names
# where the supporting measurement/argument is committed. Re-litigating
# one of these requires editing this table — which shows up in the diff.

_QUAD = (
    "quadratic-by-contract",
    "The query's CONTRACT is exact pair enumeration (all-pairs / "
    "replication-density shingle joins): output volume is O(n^2) in the "
    "duplicated mass by definition, so wall-clock comparisons degrade "
    "with factor^2 regardless of engine. The production path for the "
    "same decision is the LSH-first family (dedup_lsh_join, "
    "dedup_minhash_pairs, sim_knn_join), measured winners at sf20.",
    "PERF.md r4 replication-density caveat; VERDICT r6/r7 standing ruling",
)
_INFEAS = (
    "comparator-infeasible",
    "DuckDB comparator cannot complete at scale (recursive-CTE blowup "
    "or >70 GB spill / killed >9 min at sf20); Spark absolutes are "
    "committed instead so the row still carries scale evidence.",
    "PERF.md r4/r6/r7 kill notes; sf20 spark-only absolutes in "
    "PERF_sf20_batch*_r7.json",
)
_CPU = (
    "single-node-cpu-floor",
    "Plan audited (pushed filters, pruned columns, bounded dims "
    "broadcast-hinted, corpus-growing sides left to AQE's adaptive "
    "strategy — the r10 broadcast-policy sweep removed every forced "
    "broadcast of a fact slice or linearly-growing dim, so the shape "
    "survives the 8 GiB broadcast cap at 100x). "
    "The r8 receipts REFUTED the r7 'parquet "
    "scan floor' wording: the bare scan of each query's own columns is "
    "0.03-0.09 s, 1-2% of Spark's query time and BELOW the comparator's "
    "whole query. The residual gap is the single-machine JVM "
    "aggregation/join row-processing constant factor vs an in-process "
    "vectorized OLAP engine — it parallelizes away with executors "
    "(the plans are the distributed shape), it cannot be planned away "
    "on one machine.",
    "SCAN_FLOOR_RECEIPTS.json (r8, embedded below); VERDICT r7 ruling "
    "as amended by the r8 receipts",
)
_KMEANS_ORACLE = (
    "comparator-infeasible",
    "The DEFINITIONAL DuckDB oracle (list-typed k-means/PQ CTE chains "
    "over 400k x 64-dim vectors) exceeds container memory at sf20 — "
    "two observed OOM kills at 93/82 GB RSS, outside memory_limit's "
    "accounting — or a 300 s interrupt. Parity holds at sf0.01-sf1; "
    "Spark absolutes are committed and grow SUBLINEARLY across the "
    "20x sf1->sf20 scale-up (e.g. pq_codes 6.2->9.9 s, kmeans_ivf "
    "4.1->7.9 s): the crossover against the comparator happened "
    "between sf1 and sf20.",
    "PERF_sf20_weak_r8.json comparator_err rows + dmesg OOM receipts "
    "in PERF.md r8; sf1 ratios in PERF_sf1_r8.json",
)
_RL_SKEW = (
    "skew-insurance",
    "The registered plan is the +n/-n difference stream chosen for the "
    "rate limiter's OPERATING regime (hot abusive keys): on skew5m "
    "(one user = 50% of 5M events) the definitional bounded RANGE "
    "frame pins a core >30 min per micro-batch (Spark re-aggregates "
    "the in-frame buffer per row) while the diff stream finishes in "
    "21.8 s value-exact. The uniform-data premium vs DuckDB's "
    "segment-tree sliding window (20x at sf20, 11.4 s absolute) is "
    "the measured price of that insurance — same trade as "
    "rel_interval_coalesce_sharded, here taken as the MAIN plan "
    "because hot keys are the query's own contract.",
    "tests/test_rate_limit_skew.py + STREAM_STATE_skew5m_r8_ratelimit"
    ".json + PERF.md r8 jstack receipt; PERF_sf20_weak_r8.json",
)
_SKEW = (
    "skew-insurance",
    "Deliberately slower variant on uniform data (4.1x at sf20); exists "
    "for the 50%-hot-key regime where it wins 1.9x over the unsharded "
    "plan. Both measurements committed.",
    "PERF.md r7 (skew5m fixture A/B); VERDICT r7 standing ruling",
)

ADJUDICATIONS: dict[str, tuple[str, str, str]] = {
    # exact pair-enumeration diagnostics
    "sim_neardup_top_pairs": _QUAD,
    "dedup_jaccard_top_pairs": _QUAD,
    "dedup_containment_pairs": _QUAD,
    "rel_fuzzy_linkage": _QUAD,
    # comparator kills (recursive CTE / spill-bound at sf20)
    "graph_pagerank": _INFEAS,
    "graph_kcore": _INFEAS,
    "graph_label_propagation": _INFEAS,
    "dedup_cluster_components": _INFEAS,
    "dedup_fuzzy_keep_best": _INFEAS,
    "dedup_survivorship_matrix": _INFEAS,
    "mm_phash_neardup": _INFEAS,
    "corpus_boilerplate_profile": _INFEAS,
    "emb_hard_negative_mining": _INFEAS,
    # single-scan TPC-H class (receipts: r8 scan-floor bake-offs —
    # which moved the ruling from 'scan floor' to 'cpu floor')
    "rel_q1_pricing_summary": _CPU,
    "rel_q3_shipping_priority": _CPU,
    "rel_q5_region_revenue": _CPU,
    "sim_cosine_topk": _CPU,
    # r8: scale-flat 3.0 s absolute (sf5 == sf20) over the full-corpus
    # cosine scan; the r8 literal-query-vector alternative measured 4x
    # WORSE (per-index array extraction), so the broadcast-join scan
    # stands as the plan — array-expression row-processing floor
    "sim_range_search": _CPU,
    # --- r9 decade-check rulings: the sf20 batch over the largest
    # sf1-only fixed-overhead absolutes surfaced these as real >2x
    # rows; each was replanned where a lever existed (A/B receipts)
    # and carries a stage decomposition locating the residual
    # (DECADE_FLOOR_RECEIPTS.json) plus a SCAN_FLOOR_RECEIPTS row
    # where the tag demands one. Negative results are committed so
    # losing experiments are not retried.
    "rel_data_quality": (
        "single-node-cpu-floor",
        "Replanned r9 (one aggregate pass per table — was 3 scans of "
        "documents; referential integrity as pre-aggregated "
        "co-partitioned left joins — was a FORCED BROADCAST of 30M "
        "parent keys, unbounded at corpus scale): 23.6 -> 13.4 s at "
        "sf20. Residual located: the exact lineitem-vs-orders key "
        "shuffle is 78% of runtime (10.2 of 13.0 s) while the bare "
        "key scan is 0.63 s and the comparator's whole orphan check "
        "is 0.94 s in-process — the one-machine exchange premium, "
        "network-parallel on executors. Tagged-union single-shuffle "
        "alternative measured no better (9.6 s, negative result).",
        "DECADE_FLOOR_RECEIPTS.json; SCAN_FLOOR_RECEIPTS.json; "
        "BVD_SWEEP_sf20_fo_r9.jsonl (before) / PERF_sf20_replan_r9"
        ".json (after)",
    ),
    "rel_active_users_rolling": (
        "single-node-cpu-floor",
        "Replanned r9: lead-capped disjoint coverage intervals + "
        "interval-boundary difference stream through one running sum "
        "(the rel_rate_limit_audit idiom) replaces the x7 fan-out + "
        "countDistinct (same-session A/B 5.59 -> 3.76 s, value-"
        "identical). Residual: the (user, day) distinct (8.0M of 20M "
        "rows) is 41% of runtime, the rest one user-partitioned lead "
        "window + day-domain rollup — every stage key-domain bounded; "
        "bare scan 0.4% of query.",
        "DECADE_FLOOR_RECEIPTS.json; SCAN_FLOOR_RECEIPTS.json",
    ),
    "emb_matryoshka_recall": (
        "single-node-cpu-floor",
        "Replanned r9: both rankings score in ONE corpus scan "
        "(full-dim + prefix-dim cosine in one projection, checkpointed "
        "score frame, two TakeOrdered) — A/B 4.49 -> 2.37 s value-"
        "identical. What remains IS the brute-force-cosine class "
        "(sim_cosine_topk's standing cpu-floor ruling, x1 scan now "
        "instead of x2); bare embedding scan 1% of query.",
        "DECADE_FLOOR_RECEIPTS.json; SCAN_FLOOR_RECEIPTS.json",
    ),
    "rel_q4_order_priority": (
        "single-node-cpu-floor",
        "Quarter-filtered orders left-semi the R-flag lines — the "
        "shape that survives 100x. Committed negative result: "
        "broadcasting the quarter-filtered orders measured 26% faster "
        "at sf20 but was REJECTED as a fixed fraction of the ORDER "
        "FACT domain (unbounded broadcast at corpus scale; AQE still "
        "broadcasts adaptively when the slice genuinely fits). Bare "
        "scan 1.3% of query — the residual is the R-line scan + semi "
        "shuffle on one machine.",
        "DECADE_FLOOR_RECEIPTS.json; SCAN_FLOOR_RECEIPTS.json",
    ),
    "rel_q9_product_profit": (
        "single-node-cpu-floor",
        "Star join with the gear-filtered part dim and full "
        "supplier/nation dims broadcast; the lineitem-vs-orders "
        "exchange dominates. Committed negative result: SHUFFLE_HASH "
        "on the orders join measured within noise of SMJ (5.0 vs "
        "4.8 s) — the cost is the exchange itself, which is what "
        "executors parallelize. Bare scans 1.8% of query.",
        "DECADE_FLOOR_RECEIPTS.json; SCAN_FLOOR_RECEIPTS.json",
    ),
    "rel_scd2_point_in_time": (
        "single-node-cpu-floor",
        "Single user-sorted merge-stream (lag + carry windows share "
        "one sort) — already the minimal-shuffle shape; 2.6x at "
        "3.3 s absolute at sf20. Bare scan 0.8% of query; the "
        "residual is the one-machine sort/row-processing constant.",
        "DECADE_FLOOR_RECEIPTS.json; SCAN_FLOOR_RECEIPTS.json",
    ),
    "rel_multitouch_attribution": (
        "single-node-cpu-floor",
        "r8's replan (ONE left-outer range join, windows on one "
        "shared exchange) stands; the r9 decomposition locates the "
        "residual: the range join ALONE (1.64 s) exceeds the "
        "comparator's whole query (1.44 s), the two purchase_id "
        "windows add 0.8 s. Bare scan 0.6% of query — no further "
        "plan lever on one machine.",
        "DECADE_FLOOR_RECEIPTS.json; SCAN_FLOOR_RECEIPTS.json; "
        "PERF.md r8 A/B",
    ),
    "sim_mmr_rerank": (
        "single-node-cpu-floor",
        "r8's grouped-pandas greedy replan stands; the r9 "
        "decomposition closes the verdict's question: the pool cut "
        "ALONE — the brute-force cosine + TakeOrdered that IS "
        "sim_cosine_topk's adjudicated operator — is 52% of runtime "
        "(2.62 of 5.07 s) and by itself exceeds the comparator's "
        "whole query 4x, so no downstream change can close the "
        "ratio; the remaining ~1.7 s is checkpoint + the "
        "sequential-in-k greedy task.",
        "WEAK_FLOOR_RECEIPTS_r9.json; DECADE_FLOOR_RECEIPTS.json; "
        "SCAN_FLOOR_RECEIPTS.json",
    ),
    "graph_bom_explosion": (
        "materialization-floor",
        "r8's binary-decomposition fold stands (each tree path "
        "produced exactly once, no per-round DISTINCT); the r9 "
        "decomposition locates the residual 2.3x: the closure build "
        "is 81% of runtime (6.2 of 7.7 s) — 44M closure rows "
        "materialize through the two MANDATORY localCheckpoints (D "
        "and P are multi-consumer frames; r8 proved lazy frames "
        "re-execute the growing subplan 3x) while the comparator "
        "builds the same closure in-process with no materialization. "
        "Checkpoint write/read bandwidth scales out with executors "
        "and local disks; the readout is 1.5 s.",
        "WEAK_FLOOR_RECEIPTS_r9.json; DECADE_FLOOR_RECEIPTS.json; "
        "PERF.md r8 A/B",
    ),
    "rel_queue_wait_lindley": (
        "surface-certification",
        "Definitional single-queue-per-type Lindley form: the "
        "prefix-sum/prefix-min windows partition on event_type (5 "
        "values), so the window stage runs on 5 of 32 cores — a "
        "collapsed-domain parallelism bound, not a plan defect (the "
        "comparator pays the same serial structure: 12-16 s for its "
        "whole query). The production path for throughput is the "
        "registered rel_queue_wait_lindley_sharded, measured-ok "
        "0.72x at sf20 — the graph_recursive_bom precedent.",
        "DECADE_FLOOR_RECEIPTS.json; PERF_bvd_sf20_r6.json (sharded "
        "twin 0.72x); BVD_SWEEP_sf20_fo_r9.jsonl",
    ),
    "sim_brp_lsh_buckets": (
        "assertion-oracle",
        "The oracle is a PROPERTY ASSERTION (count + TRUE literals, "
        "0.002 s by design — bucket ids of a seeded random projection "
        "are not SQL-reproducible, the rel_approx_distinct pattern) "
        "while the Spark side does the actual verification work "
        "(spark.ml BRP-LSH bucketing + the centroid-identity "
        "locality check over 2M x 64 components). The ratio is "
        "structurally meaningless; the Spark absolute is committed "
        "and grows SUBLINEARLY across the decade: 1.86 s at sf1 -> "
        "8.1 s at sf20 (4.4x over 20x data).",
        "DECADE_FLOOR_RECEIPTS.json; BVD_SWEEP_sf20_fo_r9.jsonl; "
        "PERF_sf1_r8.json",
    ),
    "rel_skew_salted_join": (
        "surface-certification",
        "Certifies the SALTING operator itself (SURVEY A27's explicit "
        "skew lever): the plan deliberately salts the build side "
        "x SALT_N and joins on (key, salt), which by construction "
        "DEFEATS broadcastability and forces the salted shuffle — "
        "that is the technique being certified, priced on uniform "
        "data (15.0 s / near-linear 18.5x growth across the decade: "
        "the salted exchange tracks the fact table, as salting "
        "must). The production trigger is the per-key hot spot AQE "
        "cannot split; on uniform data the plain broadcast join "
        "(rel_q14 et al) is the obvious winner and this row is "
        "insurance, the rel_interval_coalesce_sharded precedent.",
        "BVD_SWEEP_sf20_fo2_r9.jsonl; DECADE_FLOOR datapoints; "
        "plans/extra_queries.py docstring",
    ),
    "udf_grouped_agg": (
        "surface-certification",
        "Certifies the pandas grouped-agg UDF seam (SURVEY UDF/UDAF "
        "surface): the Arrow group transfer + Python execution IS "
        "the operator under test, measured against a comparator "
        "running the equivalent NATIVE SQL aggregate (0.08 s) — the "
        "84x is the declared price of the Python boundary, which "
        "production plans pay only when the aggregate cannot be "
        "expressed in JVM expressions (every hot-path agg in this "
        "repo is JVM-side). Growth across the decade is sublinear "
        "(0.65 -> 6.5 s, 10x over 20x).",
        "BVD_SWEEP_sf20_fo2_r9.jsonl; PERF_sf1_r8.json; "
        "plans/extra_queries.py UDF surface block",
    ),
    # skew-insurance variant
    "rel_interval_coalesce_sharded": _SKEW,
    # skew-proof main plan with a measured uniform premium (r8)
    "rel_rate_limit_audit": _RL_SKEW,
    # definitional kmeans/PQ oracles OOM-kill the container at sf20 (r8)
    "emb_cluster_purity": _KMEANS_ORACLE,
    "emb_outlier_detection": _KMEANS_ORACLE,
    "emb_pq_codes": _KMEANS_ORACLE,
    "sim_ivf_nprobe_recall": _KMEANS_ORACLE,
    "sim_ivf_pq_search": _KMEANS_ORACLE,
    "sim_ivfpq_recall": _KMEANS_ORACLE,
    "sim_kmeans_ivf": _KMEANS_ORACLE,
    # engine-surface certification row: the query EXISTS to exercise
    # Spark 4.x's native WITH RECURSIVE operator (its docstring names
    # graph_bom_explosion's binary-decomposition fold as the scale
    # path for deep hierarchies — 2.31x / 7.2 s at sf20 after the r8
    # rewrite); depth-linear native recursion over the div-4 part
    # tree (~log4(4M parts) ~ 11 levels at sf20, ~16 only at 100 TB
    # key ranges per the plan docstring) is that many sequential
    # frontier joins of driver-scheduled stages, the measured cost
    # of certifying the operator itself
    "graph_recursive_bom": (
        "surface-certification",
        "Certifies Spark 4.x native WITH RECURSIVE (anchor + step + "
        "fixpoint + recursion guard conf) against DuckDB's native "
        "recursion — the row's purpose is the ENGINE OPERATOR, not "
        "the fastest plan for the semantics: the same closure's "
        "production path is graph_bom_explosion's no-distinct binary-"
        "decomposition fold, measured 2.31x/7.2 s at sf20 (r8 "
        "rewrite, was 4.0x/20.8 s). Native recursion costs one "
        "driver-scheduled frontier join per level — the div-4 part "
        "tree is ~log4(4M parts) ~ 11 levels deep at sf20 (~16 only "
        "at 100 TB key ranges, per the plan docstring) — a depth-"
        "linear scheduling floor.",
        "PERF_sf20_weak_r8.json (both rows); graph_queries.py "
        "docstrings; r8 bake-off in PERF.md",
    ),
    # comparator dies at sf20 while the Spark absolute is strong (r8)
    "graph_assortativity": (
        "comparator-infeasible",
        "DuckDB cannot finish the 180M-edge MATERIALIZED edge build "
        "within the 300 s cap at sf20; Spark completes in 5.9 s over "
        "the shared bucketed edge table (the r4 62 s sf5 reading "
        "predates that table). Ratios stand at sf5 (5.3x on the "
        "pre-bucketing plan).",
        "PERF_sf20_weak_r8.json; PERF_sf5_r4e.json",
    ),
    "rel_basket_lift": (
        "comparator-infeasible",
        "Catalog-wide pair co-occurrence: the pair domain approaches "
        "|parts|^2-bounded mass (~630M pairs at sf20), DuckDB OOMs its "
        "28 GB budget building the pair hash table; Spark completes in "
        "61 s. Production basket analysis prunes to top-K items first "
        "— the full-catalog form is the stress diagnostic.",
        "PERF_sf20_weak_r8.json comparator_err row; sf1 ratio 5.2x in "
        "PERF_sf1_r8.json",
    ),
}


def harvest() -> tuple[dict[str, dict], dict[str, dict]]:
    """Largest-scale datapoint per query across every PERF_*.json,
    plus the per-sf spark-absolute history (>= SF_FLOOR only) that the
    sublinear-decade rule reads.

    Ties on sf prefer the LATER file name (lexicographic — round suffixes
    sort r3 < r4 < ... so a fresh re-measurement at the same scale
    supersedes a stale one).
    """
    best: dict[str, dict] = {}
    history: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "PERF_*.json"))):
        try:
            d = json.load(open(f))
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        sf = d.get("sf")
        q = d.get("queries")
        if sf is None or not isinstance(q, dict):
            continue
        src = os.path.basename(f)
        for name, rec in q.items():
            if not isinstance(rec, dict):
                rec = {"spark_sec": rec, "duckdb_sec": None, "ratio": None}
            cur = best.get(name)
            if cur is None or sf >= cur["sf"]:
                best[name] = {
                    "sf": sf,
                    "spark_sec": rec.get("spark_sec"),
                    "duckdb_sec": rec.get("duckdb_sec"),
                    "ratio": rec.get("ratio"),
                    "source": src,
                }
            if sf >= SF_FLOOR and rec.get("spark_sec") is not None:
                # same tie rule: later file at the same sf supersedes
                history.setdefault(name, {})[sf] = rec["spark_sec"]
    return best, history


# Sublinear-decade rule (r9): a row whose ratio is >2 with a material
# absolute is NOT a latent scale defect when its own measured decade
# shows the absolute growing materially slower than the data — the
# reading is a single-node constant factor, already ruled on for the
# class (the cpu-floor family), with the two datapoints as the receipt.
# Threshold: growth <= 0.75 x the sf span (e.g. <= 15x over a 20x
# decade) across a span of at least 5x. Rows without a qualifying pair
# stay weak.
SUBLINEAR_SPAN_MIN = 5.0
SUBLINEAR_GROWTH_FRAC = 0.75


def _decade(history: dict[float, float] | None) -> dict | None:
    if not history or len(history) < 2:
        return None
    lo_sf, hi_sf = min(history), max(history)
    if lo_sf <= 0 or hi_sf / lo_sf < SUBLINEAR_SPAN_MIN:
        return None
    lo, hi = history[lo_sf], history[hi_sf]
    if not lo or not hi:
        return None
    return {
        "low": {"sf": lo_sf, "spark_sec": lo},
        "high": {"sf": hi_sf, "spark_sec": hi},
        "sf_span": round(hi_sf / lo_sf, 1),
        "growth": round(hi / lo, 2),
    }


def classify(name: str, dp: dict | None, history: dict | None = None) -> dict:
    entry: dict = {"query": name}
    adj = ADJUDICATIONS.get(name)
    usable = dp if dp and dp["sf"] >= SF_FLOOR else None
    if usable:
        entry["datapoint"] = usable
    if adj:
        tag, note, cite = adj
        entry.update(kind="adjudicated", tag=tag, note=note, cite=cite)
        return entry
    if usable is None:
        entry["kind"] = "UNCLASSIFIED"
        return entry
    ratio = usable.get("ratio")
    spark_sec = usable.get("spark_sec")
    if ratio is None:
        # spark-only datapoint without an adjudication: evidence exists
        # but the row still owes either a comparator run or a ruling
        entry["kind"] = "UNCLASSIFIED"
        return entry
    if ratio <= RATIO_GATE:
        entry["kind"] = "measured-ok"
    elif spark_sec is not None and spark_sec <= FIXED_OVERHEAD_SEC:
        entry["kind"] = "fixed-overhead"
        entry["note"] = (
            f"spark absolute {spark_sec}s <= {FIXED_OVERHEAD_SEC}s at "
            f"sf{usable['sf']:g}: session/scheduling floor vs a "
            "near-instant comparator (collapsed-domain rule, VERDICT r6/r7)"
        )
    else:
        dec = _decade(history)
        if dec and dec["growth"] <= SUBLINEAR_GROWTH_FRAC * dec["sf_span"]:
            entry["kind"] = "sublinear-decade"
            entry["decade"] = dec
            entry["note"] = (
                f"ratio {ratio} with a material absolute, but the row's "
                f"own measured decade shows SUBLINEAR growth: "
                f"{dec['low']['spark_sec']}s at sf{dec['low']['sf']:g} -> "
                f"{dec['high']['spark_sec']}s at sf{dec['high']['sf']:g} "
                f"({dec['growth']}x over a {dec['sf_span']}x span) — not "
                "a latent scale defect; the residual is the single-node "
                "constant factor (cpu-floor class ruling), receipt = the "
                "two datapoints"
            )
        else:
            entry["kind"] = "weak"
    return entry


def build_index() -> dict:
    best, history = harvest()
    registry = sorted(plans.all_queries())
    rows = {n: classify(n, best.get(n), history.get(n)) for n in registry}
    kinds: dict[str, int] = {}
    for e in rows.values():
        kinds[e["kind"]] = kinds.get(e["kind"], 0) + 1
    receipts_path = os.path.join(ROOT, "SCAN_FLOOR_RECEIPTS.json")
    receipts = None
    if os.path.exists(receipts_path):
        receipts = json.load(open(receipts_path))
    return {
        "sf_floor": SF_FLOOR,
        "fixed_overhead_sec": FIXED_OVERHEAD_SEC,
        "ratio_gate": RATIO_GATE,
        "n_queries": len(registry),
        "kinds": dict(sorted(kinds.items())),
        "weak": sorted(
            (n for n, e in rows.items() if e["kind"] == "weak"),
            key=lambda n: -(rows[n]["datapoint"].get("ratio") or 0),
        ),
        "unclassified": sorted(
            n for n, e in rows.items() if e["kind"] == "UNCLASSIFIED"
        ),
        "scan_floor_receipts": receipts,
        "rows": rows,
    }


def render_md(idx: dict) -> str:
    lines = [
        "# PERF evidence index",
        "",
        "Generated by `scripts/perf_index.py` from every `PERF_*.json` at",
        "the repo root; gated by `tests/test_perf_index_gate.py` (every",
        "registered query must carry a >=sf1 datapoint or a standing",
        "adjudication; the committed JSON must match a fresh build).",
        "Regenerate after adding any PERF artifact:",
        "`python scripts/perf_index.py`.",
        "",
        f"- registry: {idx['n_queries']} queries",
        f"- kinds: {json.dumps(idx['kinds'])}",
        f"- datapoint floor: sf>={idx['sf_floor']:g}; ratio gate "
        f"{idx['ratio_gate']:g}x; fixed-overhead absolute "
        f"<= {idx['fixed_overhead_sec']:g}s",
        "",
    ]
    if idx["unclassified"]:
        lines += [
            "## UNCLASSIFIED (gate failures)",
            "",
            *[f"- `{n}`" for n in idx["unclassified"]],
            "",
        ]
    lines += [
        "## Weak rows (ratio > 2x at largest measured scale — open work)",
        "",
    ]
    if idx["weak"]:
        lines += [
            "| query | sf | spark s | duckdb s | ratio | source |",
            "|---|---|---|---|---|---|",
        ]
        for n in idx["weak"]:
            d = idx["rows"][n]["datapoint"]
            lines.append(
                f"| `{n}` | {d['sf']:g} | {d['spark_sec']} | "
                f"{d['duckdb_sec']} | {d['ratio']} | {d['source']} |"
            )
    else:
        lines.append("(none)")
    sub = sorted(
        (n for n, e in idx["rows"].items() if e["kind"] == "sublinear-decade"),
        key=lambda n: -(idx["rows"][n]["datapoint"].get("spark_sec") or 0),
    )
    lines += [
        "",
        "## Sublinear-decade rows (ratio > 2x, but the row's own "
        "measured decade shows sublinear growth — constant factor, "
        "not a scale defect; receipt = the two datapoints)",
        "",
    ]
    if sub:
        lines += [
            "| query | low | high | growth / span | ratio |",
            "|---|---|---|---|---|",
        ]
        for n in sub:
            e = idx["rows"][n]
            dec, d = e["decade"], e["datapoint"]
            lines.append(
                f"| `{n}` | {dec['low']['spark_sec']}s @ sf"
                f"{dec['low']['sf']:g} | {dec['high']['spark_sec']}s @ sf"
                f"{dec['high']['sf']:g} | {dec['growth']}x / "
                f"{dec['sf_span']}x | {d['ratio']} |"
            )
    else:
        lines.append("(none)")
    lines += ["", "## Adjudications (standing rulings, hand-curated)", ""]
    lines += [
        "| query | tag | largest-scale datapoint | cite |",
        "|---|---|---|---|",
    ]
    for n, e in sorted(idx["rows"].items()):
        if e["kind"] != "adjudicated":
            continue
        d = e.get("datapoint")
        dp = (
            f"sf{d['sf']:g}: spark {d['spark_sec']}s"
            + (f", ratio {d['ratio']}" if d.get("ratio") else " (spark-only)")
            if d
            else "—"
        )
        lines.append(f"| `{n}` | {e['tag']} | {dp} | {e['cite']} |")
    lines += ["", "## Full classification", ""]
    lines += [
        "| query | kind | sf | spark s | ratio | source |",
        "|---|---|---|---|---|---|",
    ]
    for n, e in sorted(idx["rows"].items()):
        d = e.get("datapoint") or {}
        lines.append(
            f"| `{n}` | {e['kind']}"
            + (f" ({e['tag']})" if e.get("tag") else "")
            + f" | {d.get('sf', '—')} | {d.get('spark_sec', '—')} | "
            f"{d.get('ratio', '—')} | {d.get('source', '—')} |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    idx = build_index()
    jpath = os.path.join(ROOT, "PERF_INDEX.json")
    if "--check" in sys.argv:
        committed = json.load(open(jpath)) if os.path.exists(jpath) else None
        if committed != idx:
            print("PERF_INDEX.json is STALE — rerun scripts/perf_index.py")
            sys.exit(1)
        print("PERF_INDEX.json fresh")
        return
    with open(jpath, "w") as f:
        json.dump(idx, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(os.path.join(ROOT, "PERF_INDEX.md"), "w") as f:
        f.write(render_md(idx))
    print(
        f"wrote PERF_INDEX.json/.md: {idx['kinds']} "
        f"({len(idx['unclassified'])} unclassified)"
    )


if __name__ == "__main__":
    main()
