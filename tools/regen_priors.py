#!/usr/bin/env python3
"""Regenerate Bench.priorMins from full-sweep JSON artifacts.

Policy (round 14, kept): the prior is the elementwise MAX across
sweeps of the per-query MEDIAN rep — "typical on the slowest observed
box-hour" — while the gate compares the current sweep's MIN against
1.5x this prior. Feed it QUIET sweeps only (comparator ~0.35 level);
a loaded sweep bakes its load into every threshold (r15 ADVICE #1).

Usage:
    python3 tools/regen_priors.py sweep1.json [sweep2.json ...] > map.txt

Each input is one line of graft.Bench JSON (the first "metric" line,
which carries per-query "reps"). Output: the Scala Map entries, two
per line, ready to paste into Bench.priorMins.
"""
import json, statistics, sys

def main():
    sweeps = []
    for path in sys.argv[1:]:
        with open(path) as f:
            d = json.loads(f.readline())
        if "reps" not in d:
            raise SystemExit(f"{path}: no per-query reps (not a full artifact)")
        print(f"-- {path}: total {d['value']}s over {len(d['queries'])} "
              f"queries, comparator {d['comparator']}", file=sys.stderr)
        sweeps.append(d["reps"])
    names = sorted(set().union(*[set(s) for s in sweeps]))
    prior = {}
    for n in names:
        meds = [statistics.median(s[n]) for s in sweeps
                if n in s and s[n] and min(s[n]) >= 0]
        if meds:
            prior[n] = round(max(meds), 2)
    items = [f'"{n}" -> {prior[n]}' for n in names if n in prior]
    for i in range(0, len(items), 2):
        print("    " + ", ".join(items[i:i + 2]) + ",")

if __name__ == "__main__":
    main()
