"""Per-query bench regression report between two BENCH_DETAIL
snapshots (r10 verdict item 5: the driver's BENCH_r*.json keeps only
the top-20 slowest medians, so a regression OUTSIDE the top-20 was
invisible between rounds — the full per-query record is now
snapshotted as BENCH_DETAIL_r{N}.json per round and compared here).

Usage:
    python scripts/bench_compare.py BENCH_DETAIL_r09.json BENCH_DETAIL.json
    python scripts/bench_compare.py old.json new.json --threshold 1.5

Flags queries whose median moved > threshold× in EITHER direction,
ignoring queries under --floor seconds on both sides (sub-300ms
entries flap with host noise, not plan shape). Exit code 0 always —
the report is a review artifact, not a gate: deltas need human
attribution (output growth, staging warm/cold, protocol change)
before they count as regressions. Prints one JSON line:
{"regressions": {...}, "improvements": {...}, "added": [...],
 "removed": [...], "totals": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _anchor_mean(snapshot: dict) -> float | None:
    """Mean of the run's pre/post calibration anchors (bench.py
    ``anchor()`` — a fixed pure-compute probe timed first and last).
    None for pre-r11 snapshots that carry no anchor. Min-merged
    snapshots (merge_bench_detail.py) carry ``anchor_runs`` instead —
    use the mean over every recorded probe."""
    a = snapshot.get("anchor")
    if isinstance(a, dict) and "pre" in a and "post" in a:
        return (float(a["pre"]) + float(a["post"])) / 2.0
    runs = snapshot.get("anchor_runs") or []
    vals = [
        float(v)
        for r in runs
        if isinstance(r, dict)
        for v in (r.get("pre"), r.get("post"))
        if v is not None
    ]
    return (sum(vals) / len(vals)) if vals else None


def _per_query_anchor(snapshot: dict) -> dict | None:
    """name → the anchor of the WINDOW the query was timed in (mean of
    the two bounding probes of bench.py's every-50-queries
    ``anchor_series``). The r13 lesson: contention on this box is
    intermittent within a run, so a single run-mean drift factor
    under-corrects queries timed inside a spike and over-corrects the
    rest; the per-window series localizes it. Falls back to the run
    mean for snapshots without a series (merged/pre-r13) and for
    queries not in the current HEADLINE order (the window position is
    reconstructed from bench.HEADLINE — the timing order)."""
    mean = _anchor_mean(snapshot)
    if mean is None:
        return None
    queries = snapshot.get("queries", {})
    a = snapshot.get("anchor")
    series = snapshot.get("anchor_series") or []
    if not isinstance(a, dict) or not series:
        return {q: mean for q in queries}
    try:
        import bench

        order = {q: i for i, q in enumerate(bench.HEADLINE)}
    except Exception:
        return {q: mean for q in queries}
    bounds = (
        [(0, float(a["pre"]))]
        + sorted((int(s["after_n"]), float(s["sec"])) for s in series)
        + [(len(order), float(a["post"]))]
    )
    out = {}
    for q in queries:
        i = order.get(q)
        if i is None:
            out[q] = mean
            continue
        prev = max((n, v) for n, v in bounds if n <= i)
        nxts = [(n, v) for n, v in bounds if n > i]
        out[q] = (prev[1] + nxts[0][1]) / 2.0 if nxts else prev[1]
    return out


def compare(
    old: dict, new: dict, threshold: float = 1.5, floor: float = 0.3
) -> dict:
    oq, nq = old["queries"], new["queries"]
    oa, na = _anchor_mean(old), _anchor_mean(new)
    # host-drift factor: >1 means the NEW box is slower on pure
    # compute; raw per-query ratios are divided by it before flagging,
    # so a whole-box slowdown stops reading as 300 plan regressions
    # (the r10 uniform-1.20× episode). Falls back to 1.0 (raw ratios)
    # when either snapshot predates the anchor. Per-query WINDOW
    # anchors (r14) localize the correction to the 50-query window
    # each side was actually timed in.
    drift = (na / oa) if (oa and na) else None
    opq, npq = _per_query_anchor(old), _per_query_anchor(new)
    regressions, improvements = {}, {}
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if max(a, b) < floor:
            continue
        raw = b / max(a, 1e-9)
        qdrift = (
            (npq[name] / opq[name])
            if (opq and npq and opq.get(name) and npq.get(name))
            else drift
        )
        norm = raw / qdrift if qdrift else raw
        rec = {"old": a, "new": b, "ratio": round(raw, 2)}
        if qdrift:
            rec["ratio_anchor_norm"] = round(norm, 2)
            rec["window_drift"] = round(qdrift, 3)
        if norm > threshold:
            regressions[name] = rec
        elif norm < 1.0 / threshold:
            improvements[name] = rec
    return {
        "regressions": regressions,
        "improvements": improvements,
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "totals": {
            "old": old.get("value"),
            "new": new.get("value"),
            "old_reps": old.get("reps"),
            "new_reps": new.get("reps"),
            "old_n": len(oq),
            "new_n": len(nq),
        },
        "anchor": {
            "old": oa,
            "new": na,
            "drift": round(drift, 3) if drift else None,
        },
        "threshold": threshold,
        "floor": floor,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.3)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    print(json.dumps(compare(old, new, args.threshold, args.floor)))


if __name__ == "__main__":
    main()
