#!/usr/bin/env python3
"""Regenerate Bench.priorMins from full-sweep JSON artifacts.

Policy (round 14, kept): the REGENERATED level is the elementwise MAX
across sweeps of the per-query MEDIAN rep — "typical on the slowest
observed box-hour" — while the gate compares the current sweep's MIN
against 1.5x the prior. Feed it QUIET sweeps only (comparator ~0.35
level); a loaded sweep bakes its load into every threshold.

Since round 16 the script performs the RATCHET-DOWN merge itself
(r15 ADVICE #1: emitting the plain max-of-medians meant rerunning on a
slower box would wholesale-RAISE thresholds): it parses the carried
table out of src/main/scala/graft/Bench.scala and emits elementwise
min(carried, regenerated). A new query (no carried entry) gets the
regenerated level; raising a carried entry is a deliberate act —
either pass --raw (no merge, the old behavior) and hand-merge with a
recorded cause, or edit the table directly.

Usage:
    python3 tools/regen_priors.py [--raw] sweep1.json [sweep2.json ...] > map.txt

Each input is one line of graft.Bench JSON (the first "metric" line,
which carries per-query "reps"). Output: the Scala Map entries, two
per line, ready to paste into Bench.priorMins. A per-entry summary
(tightened/kept/raise-suppressed counts) goes to stderr.
"""
import json, os, re, statistics, sys

BENCH = os.path.join(os.path.dirname(__file__), "..",
                     "src", "main", "scala", "graft", "Bench.scala")

def carried_table(path=BENCH):
    """Parse Bench.priorMins entries ("name" -> value) from the source.
    The table is a pure-literal Map; a regex over the file body is
    exact for it (entries are the only `"qNN..." -> <double>` pairs).
    """
    with open(path) as f:
        src = f.read()
    return {m.group(1): float(m.group(2)) for m in
            re.finditer(r'"(q\w+)"\s*->\s*([0-9.]+)', src)}

def main():
    args = sys.argv[1:]
    raw = "--raw" in args
    paths = [a for a in args if a != "--raw"]
    if not paths:
        raise SystemExit(__doc__)
    sweeps = []
    for path in paths:
        with open(path) as f:
            d = json.loads(f.readline())
        if "reps" not in d:
            raise SystemExit(f"{path}: no per-query reps (not a full artifact)")
        print(f"-- {path}: total {d['value']}s over {len(d['queries'])} "
              f"queries, comparator {d['comparator']}", file=sys.stderr)
        sweeps.append(d["reps"])
    names = sorted(set().union(*[set(s) for s in sweeps]))
    regen = {}
    for n in names:
        meds = [statistics.median(s[n]) for s in sweeps
                if n in s and s[n] and min(s[n]) >= 0]
        if meds:
            regen[n] = round(max(meds), 2)
    carried = {} if raw else carried_table()
    prior, tightened, kept, suppressed, new = {}, 0, 0, 0, 0
    for n in names:
        if n not in regen:
            continue
        c = carried.get(n)
        if c is None:
            prior[n] = regen[n]
            new += 1
        elif regen[n] < c:
            prior[n] = regen[n]
            tightened += 1
        else:
            prior[n] = c
            if regen[n] > c:
                suppressed += 1
            else:
                kept += 1
    if not raw:
        print(f"-- merge vs carried table ({len(carried)} entries): "
              f"{tightened} tightened, {kept} unchanged, {suppressed} "
              f"raise-suppressed (regenerated > carried; raising is a "
              f"deliberate act — see --raw), {new} new", file=sys.stderr)
    items = [f'"{n}" -> {prior[n]}' for n in names if n in prior]
    for i in range(0, len(items), 2):
        print("    " + ", ".join(items[i:i + 2]) + ",")

if __name__ == "__main__":
    main()
