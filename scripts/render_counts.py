"""Render registry counts into README.md / SURVEY.md mechanically.

The r11 verdict caught both documents carrying stale hand-edited
inventory counts (406/408 and 397/395 vs the actual registry). This
script is the fix: the counts are now COMPUTED from
``plans.QUERIES``/``plans.ORACLES`` and substituted into the two
sentences in place, and ``tests/test_bench_contract.py::
test_doc_counts_match_registry`` fails the suite whenever the files
and the registry disagree — run this script to refresh.

Usage: python scripts/render_counts.py        # rewrite + report
       python scripts/render_counts.py --check # exit 1 on drift
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# sentence templates; group 1/2 are the only parts the script rewrites
README_PAT = re.compile(
    r"Every claimed operator has a `queries\(\)` entry; (\d+) of (\d+) also"
)
SURVEY_PAT = re.compile(
    r"All (\d+) registry queries pass the local sweep; (\d+)\s*\nare hash-gated"
)


def current_counts() -> tuple[int, int]:
    from web_analytics_visits_re_processing_spark.plans import ORACLES, QUERIES

    return len(QUERIES), len(ORACLES)


def render(check_only: bool) -> int:
    n_q, n_o = current_counts()
    drift = []
    for fname, pat, repl in [
        (
            "README.md",
            README_PAT,
            f"Every claimed operator has a `queries()` entry; {n_o} of {n_q} also",
        ),
        (
            "SURVEY.md",
            SURVEY_PAT,
            f"All {n_q} registry queries pass the local sweep; {n_o}\nare hash-gated",
        ),
    ]:
        path = os.path.join(REPO, fname)
        with open(path) as fh:
            text = fh.read()
        m = pat.search(text)
        if m is None:
            print(f"ERROR: count sentence not found in {fname}", file=sys.stderr)
            return 2
        found = (int(m.group(1)), int(m.group(2)))
        want = (n_o, n_q) if fname == "README.md" else (n_q, n_o)
        if found != want:
            drift.append((fname, found, want))
            if not check_only:
                with open(path, "w") as fh:
                    fh.write(pat.sub(repl, text, count=1))
    if drift:
        for fname, found, want in drift:
            verb = "STALE" if check_only else "updated"
            print(f"{fname}: {verb} {found} -> {want}")
        return 1 if check_only else 0
    print(f"counts current: {n_q} queries, {n_o} oracle-gated")
    return 0


if __name__ == "__main__":
    sys.exit(render("--check" in sys.argv[1:]))
