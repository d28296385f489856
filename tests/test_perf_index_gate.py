"""PERF evidence gate (VERDICT r7 item 1) — perf sibling of test_ritual_gate.

The correctness rituals are gated (test_ritual_gate.py); scale evidence
was not: datapoints lived in prose tables across PERF.md and a dozen
PERF_*.json files, adjudications in five places, and nothing enumerated
which registered queries still lacked a >=sf1 datapoint. This gate makes
the index (scripts/perf_index.py -> PERF_INDEX.json/.md) structural:

1. Every registered query classifies as measured-ok / fixed-overhead /
   weak / adjudicated — ZERO UNCLASSIFIED rows (no datapoint at >=sf1
   and no standing adjudication = the suite fails until the row is
   measured via scripts/bvd_sweep.py or a ruling lands in
   scripts/perf_index.py ADJUDICATIONS).
2. The committed PERF_INDEX.json matches a fresh build from the
   PERF_*.json evidence on disk (stale index = fail), and covers the
   current registry exactly (a query registered after the index ran =
   fail) — same "no point-in-time snapshots" rule as the ritual gate.
3. Every adjudicated query still exists in the registry (a ruling may
   never outlive its query), and the scan-floor rulings carry their
   committed receipt rows.
"""

from __future__ import annotations

import importlib.util
import json
import os

from mrc_spark_jobs_pubmed_spark import plans

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_perf_index_module():
    spec = importlib.util.spec_from_file_location(
        "perf_index", os.path.join(REPO, "scripts", "perf_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _committed() -> dict:
    path = os.path.join(REPO, "PERF_INDEX.json")
    assert os.path.exists(path), (
        "PERF_INDEX.json missing — run scripts/perf_index.py and commit it"
    )
    return json.load(open(path))


def test_no_unclassified_rows():
    idx = _committed()
    assert idx["unclassified"] == [], (
        f"{len(idx['unclassified'])} queries carry neither a >=sf1 "
        f"datapoint nor an adjudication: {idx['unclassified'][:10]}... — "
        "measure them (scripts/bvd_sweep.py) or adjudicate them "
        "(scripts/perf_index.py ADJUDICATIONS), then rerun perf_index.py"
    )


def test_index_fresh_and_covers_registry():
    mod = _load_perf_index_module()
    fresh = mod.build_index()
    committed = _committed()
    assert committed == fresh, (
        "PERF_INDEX.json is stale relative to the registry or the "
        "PERF_*.json evidence on disk — rerun scripts/perf_index.py"
    )
    names = set(plans.all_queries())
    assert set(fresh["rows"]) == names, (
        "index rows diverge from the registry — rerun scripts/perf_index.py"
    )


def test_adjudications_reference_live_queries():
    mod = _load_perf_index_module()
    names = set(plans.all_queries())
    dead = sorted(set(mod.ADJUDICATIONS) - names)
    assert not dead, f"adjudications for queries no longer registered: {dead}"


def test_scan_floor_rulings_have_receipts():
    """Each cpu-floor adjudication (nee scan-floor — the r8 receipts
    relocated the constant factor from the scan to JVM row-processing)
    must cite a committed bake-off row."""
    mod = _load_perf_index_module()
    scan_queries = [
        n
        for n, (tag, _, _) in mod.ADJUDICATIONS.items()
        if tag == "single-node-cpu-floor"
    ]
    if not scan_queries:
        return
    path = os.path.join(REPO, "SCAN_FLOOR_RECEIPTS.json")
    assert os.path.exists(path), (
        "scan-floor adjudications exist but SCAN_FLOOR_RECEIPTS.json is "
        "not committed — run scripts/scan_floor.py"
    )
    receipts = json.load(open(path))
    missing = sorted(set(scan_queries) - set(receipts.get("receipts", {})))
    assert not missing, f"scan-floor ruling without a receipt row: {missing}"


def test_all_receipt_bearing_kinds_have_receipts():
    """r9 VERDICT item 3 (landed r10): the receipt requirement covers
    EVERY receipt-bearing adjudication kind, not just cpu-floor — a
    prose-only ruling must not be able to re-enter the index through
    `materialization-floor` or `assertion-oracle`. materialization-floor
    needs a measured stage decomposition (WEAK_FLOOR / DECADE_FLOOR);
    assertion-oracle needs a measured decade datapoint (DECADE_FLOOR)."""
    mod = _load_perf_index_module()

    def _rows(fname):
        path = os.path.join(REPO, fname)
        return set(json.load(open(path)).get("receipts", {})) if os.path.exists(path) else set()

    decomposed = _rows("WEAK_FLOOR_RECEIPTS_r9.json") | _rows("DECADE_FLOOR_RECEIPTS.json")
    decade = _rows("DECADE_FLOOR_RECEIPTS.json")
    required = {
        "materialization-floor": decomposed,
        "assertion-oracle": decade,
    }
    missing = sorted(
        f"{n} ({tag})"
        for n, (tag, _, _) in mod.ADJUDICATIONS.items()
        if tag in required and n not in required[tag]
    )
    assert not missing, (
        "receipt-bearing adjudication kinds without an embedded measured "
        f"receipt row: {missing} — add the stage decomposition / decade "
        "datapoint to the receipts file before the ruling may stand"
    )
