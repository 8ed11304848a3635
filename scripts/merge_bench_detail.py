"""Merge two BENCH_DETAIL runs into the close-out per-query-min
snapshot (the r12 protocol): median := min of the two runs' medians,
cold := min of colds, anchors recorded from both.

Usage: python scripts/merge_bench_detail.py A.json B.json OUT.json
"""

import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
out = {
    "metric": a.get("metric", "headline_total_sec"),
    "protocol": "per-query min of two full runs",
    "anchor_runs": [a.get("anchor"), b.get("anchor")],
    "queries": {
        k: min(a["queries"][k], b["queries"].get(k, a["queries"][k]))
        for k in a["queries"]
    },
    "queries_cold": {
        k: min(
            a["queries_cold"][k], b["queries_cold"].get(k, a["queries_cold"][k])
        )
        for k in a["queries_cold"]
    },
}
out["total"] = round(sum(out["queries"].values()), 3)
out["n_queries"] = len(out["queries"])
json.dump(out, open(sys.argv[3], "w"), indent=1, sort_keys=True)
print(out["total"], out["n_queries"])
