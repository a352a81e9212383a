#!/usr/bin/env python3
"""Regenerate the BASELINE.md per-query budget table from full-bench runs.

Usage: budget_table.py run1.json run2.json [run3.json ...]

Prints per-query max across runs, the proposed budget (max x headroom,
rounded up to 0.05), and the current BASELINE.md budget for comparison.
Headroom: x1.3 (the round-5 full-bench discipline).
"""
import json, math, re, sys

runs = [json.load(open(p))["queries"] for p in sys.argv[1:]]
keys = sorted(set().union(*[set(r) for r in runs]))

cur = {}
for line in open("BASELINE.md"):
    m = re.match(r"\| `([a-z0-9_]+)` \| ([0-9.]+) \|", line)
    if m:
        cur[m.group(1)] = float(m.group(2))

print(f"{'query':30s} {'samples':>24s} {'max':>6s} {'prop':>6s} {'cur':>6s}")
for k in keys:
    vals = [r[k] for r in runs if k in r]
    mx = max(vals)
    prop = math.ceil(mx * 1.3 * 20) / 20
    samples = "/".join(f"{v:.2f}" for v in vals)
    flag = " <-- raise" if k in cur and prop > cur[k] else ""
    print(f"{k:30s} {samples:>24s} {mx:6.2f} {prop:6.2f} {cur.get(k, float('nan')):6.2f}{flag}")
print("totals:", "/".join(f"{sum(r.values()):.1f}" for r in runs))
