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


def compare(
    old: dict, new: dict, threshold: float = 1.5, floor: float = 0.3
) -> dict:
    oq, nq = old["queries"], new["queries"]
    regressions, improvements = {}, {}
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if max(a, b) < floor:
            continue
        if b > a * threshold:
            regressions[name] = {"old": a, "new": b, "ratio": round(b / max(a, 1e-9), 2)}
        elif a > b * threshold:
            improvements[name] = {"old": a, "new": b, "ratio": round(b / max(a, 1e-9), 2)}
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
