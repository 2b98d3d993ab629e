#!/usr/bin/env python3
"""Freeze a BASELINE_*.json from a Bench full artifact.

Usage: freeze_baseline.py <bench_full.json> <out_baseline.json> <sf-tag>

Copies per-gate MEDIANS (the tripwire compares min-of-passes against
these, so medians give the bar a small honest cushion), records the
pass count, the source artifact and the testdata generation marker.
"""
import json, sys, os

src, out, sf = sys.argv[1], sys.argv[2], sys.argv[3]
j = json.load(open(src))
assert j.get("iters", 0) >= 2, f"refusing to freeze a cold artifact (iters={j.get('iters')})"
baseline = {
    "iters": j["iters"],
    "queries": dict(sorted(j["queries"].items())),
    "sf": sf,
    "source": os.path.basename(src),
    "probes": j.get("probes", []),
    "probes_mt": j.get("probes_mt", []),
    "total": sum(j["queries"].values()),
}
with open(out, "w") as f:
    json.dump(baseline, f, indent=1)
    f.write("\n")
print(f"froze {len(baseline['queries'])} gates, total {baseline['total']:.1f}s -> {out}")
