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


def _anchor_mean(snapshot: dict) -> float | None:
    """Mean of the run's pre/post calibration anchors (bench.py
    ``anchor()`` — a fixed pure-compute probe timed first and last).
    None for pre-r11 snapshots that carry no anchor."""
    a = snapshot.get("anchor")
    if not isinstance(a, dict) or "pre" not in a or "post" not in a:
        return None
    return (float(a["pre"]) + float(a["post"])) / 2.0


def compare(
    old: dict, new: dict, threshold: float = 1.5, floor: float = 0.3
) -> dict:
    oq, nq = old["queries"], new["queries"]
    oa, na = _anchor_mean(old), _anchor_mean(new)
    # host-drift factor: >1 means the NEW box is slower on pure
    # compute; raw per-query ratios are divided by it before flagging,
    # so a whole-box slowdown stops reading as 300 plan regressions
    # (the r10 uniform-1.20× episode). Falls back to 1.0 (raw ratios)
    # when either snapshot predates the anchor.
    drift = (na / oa) if (oa and na) else None
    regressions, improvements = {}, {}
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if max(a, b) < floor:
            continue
        raw = b / max(a, 1e-9)
        norm = raw / drift if drift else raw
        rec = {"old": a, "new": b, "ratio": round(raw, 2)}
        if drift:
            rec["ratio_anchor_norm"] = round(norm, 2)
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
