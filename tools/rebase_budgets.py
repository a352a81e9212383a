#!/usr/bin/env python3
"""Round-9 full-table budget re-base.

Usage: rebase_budgets.py run1.json run2.json run3.json [--apply]

Inputs are LOCAL full-cold-bench JSONs (full-name keys, from
`graft.Bench <out.json>`). For every query:

    budget = ceil_0.05( max(localMax * DRIVER_INFLATION, driver_r08) * HEADROOM )

- localMax:   per-query MAX across the local runs (the round-3 "max
              absorbs box noise" discipline);
- DRIVER_INFLATION = 1.35: the driver bench has run 25-40% hotter than
  an identically-configured local cold bench every round it has been
  comparable (BENCH_r07/r08 vs the local runs recorded in BASELINE.md);
  budgets must be driver-shaped, so local samples are lifted into
  driver units;
- driver_r08: the one post-codegen-fix DRIVER sample (BENCH_r08.json,
  short keys matched on the id prefix) — a real driver observation
  outranks an estimate when it is larger. Skipped for queries whose
  PLAN changed in round 9 (the sample describes the old plan):
  d42/d38 (de-skew rewrite), p04 (persisted shards), m02 (byte-stat
  features), and d46-d48 (new);
- HEADROOM = 1.3: the same multi-sample headroom every re-base has used.

Prints the proposed table; with --apply, rewrites the BASELINE.md
budget table in place (rows + footer row-sum).
"""
import json, math, re, sys

DRIVER_INFLATION = 1.35
HEADROOM = 1.3
PLAN_CHANGED_R9 = {"d42_span_dedup", "d38_dup_weights", "p04_equidepth_bins",
                   "m02_frame_features", "d46_pair_store_publish",
                   "d47_store_contamination", "d48_store_edit_verify"}

def short_key(full):
    # mirrors Bench.shortKey (Bench.scala) including its getOrElse
    # fallback — a future q_* query not in the dict must fall back to
    # the id prefix, not crash the re-base run
    return {"q_wordcount": "qwc", "q_topk": "qtk", "q_inverted_index": "qii",
            "q_wordcount_republic": "qwcr", "q_topk_republic": "qtkr",
            "q_inverted_index_republic": "qiir"}.get(full, full.split("_")[0])

def ceil05(x):
    return math.ceil(x * 20) / 20

def main():
    apply_it = "--apply" in sys.argv
    paths = [p for p in sys.argv[1:] if not p.startswith("--")]
    runs = [json.load(open(p))["queries"] for p in paths]
    driver = json.load(open("BENCH_r08.json"))["parsed"]["queries"]
    keys = sorted(set().union(*[set(r) for r in runs]))

    budgets = {}
    print(f"{'query':30s} {'samples':>22s} {'drv8':>6s} {'prop':>6s}")
    for k in keys:
        vals = [r[k] for r in runs if k in r]
        local_max = max(vals)
        drv = driver.get(short_key(k))
        use_drv = drv if (drv is not None and k not in PLAN_CHANGED_R9) else 0.0
        budget = ceil05(max(local_max * DRIVER_INFLATION, use_drv) * HEADROOM)
        budgets[k] = budget
        samples = "/".join(f"{v:.2f}" for v in vals)
        print(f"{k:30s} {samples:>22s} "
              f"{(f'{drv:.2f}' if drv is not None else '-'):>6s} {budget:6.2f}")
    total = sum(budgets.values())
    print(f"{'TOTAL':30s} {'':>22s} {'':>6s} {total:6.1f}")

    if apply_it:
        src = open("BASELINE.md").read()
        rows = "\n".join(f"| `{k}` | {budgets[k]:.2f} |" for k in keys)
        table = (f"| query | budget (s) |\n|---|---|\n{rows}\n"
                 f"| **total** | **{total:.1f}** |\n")
        new, n = re.subn(
            r"\| query \| budget \(s\) \|\n\|---\|---\|\n(?:\|.*\|\n)+",
            table, src)
        assert n == 1, f"expected exactly one budget table, found {n}"
        open("BASELINE.md", "w").write(new)
        print("BASELINE.md table rewritten")

if __name__ == "__main__":
    main()
