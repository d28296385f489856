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
_SCAN = (
    "scan-floor",
    "Plan audited (all-broadcast star, pushed filters, pruned columns — "
    "the 1000-executor shape); the residual gap is the single-machine "
    "parquet scan + JVM row-processing constant factor, demonstrated by "
    "measuring the bare scan of the same columns, which alone exceeds "
    "the comparator's whole-query time.",
    "scan-floor receipts in PERF_INDEX.json scan_floor_receipts "
    "(r8); VERDICT r7 standing ruling",
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
    # single-scan TPC-H class (receipts: scan-floor bake-offs)
    "rel_q1_pricing_summary": _SCAN,
    "rel_q3_shipping_priority": _SCAN,
    "rel_q5_region_revenue": _SCAN,
    "sim_cosine_topk": _SCAN,
    # skew-insurance variant
    "rel_interval_coalesce_sharded": _SKEW,
}


def harvest() -> dict[str, dict]:
    """Largest-scale datapoint per query across every PERF_*.json.

    Ties on sf prefer the LATER file name (lexicographic — round suffixes
    sort r3 < r4 < ... so a fresh re-measurement at the same scale
    supersedes a stale one).
    """
    best: dict[str, dict] = {}
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
    return best


def classify(name: str, dp: dict | None) -> dict:
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
        entry["kind"] = "weak"
    return entry


def build_index() -> dict:
    best = harvest()
    registry = sorted(plans.all_queries())
    rows = {n: classify(n, best.get(n)) for n in registry}
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
