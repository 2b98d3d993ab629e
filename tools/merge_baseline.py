#!/usr/bin/env python3
"""Merge FIRST-MEASUREMENT entries for new gates into a frozen
BASELINE_*.json without touching existing (frozen) entries — the
convention since round 10: the frozen reference stays comparable
across rounds while new gates gain a bar to tripwire against.

Usage: merge_baseline.py <bench_full.json> <baseline.json>
"""
import json, sys, os

src, base = sys.argv[1], sys.argv[2]
j = json.load(open(src))
assert j.get("iters", 0) >= 2, f"refusing a cold artifact (iters={j.get('iters')})"
b = json.load(open(base))
added = {k: v for k, v in j["queries"].items() if k not in b["queries"]}
b["queries"].update(sorted(added.items()))
b["queries"] = dict(sorted(b["queries"].items()))
b["total"] = sum(b["queries"].values())
b.setdefault("merged_from", []).append(
    {"source": os.path.basename(src), "iters": j["iters"], "gates": sorted(added)})
with open(base, "w") as f:
    json.dump(b, f, indent=1)
    f.write("\n")
print(f"merged {len(added)} new gates into {base} "
      f"({len(b['queries'])} total): {sorted(added)}")
