#!/usr/bin/env python3
"""Join a merged decade-campaign result against the sf0.1 BENCH_FULL
snapshot and print per-query scale ratios.

Usage: scripts/decade_ratio.py /tmp/bench_sf10d.json [BENCH_FULL.json] [topN]

Prints: suite totals, the topN slowest absolute rows at the scaled SF,
and every row whose ratio exceeds the linear-in-data expectation hint
(ratio > scale/4 is flagged WATCH, > scale/2 flagged WEAK; for a 100x
corpus on fixed cores, sublinear ratios are the norm because sf0.1 rows
are mostly fixed-overhead-bound).
"""
import json
import sys

scaled_path = sys.argv[1]
base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json"
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20

scaled = json.load(open(scaled_path))
base = json.load(open(base_path))
sq, bq = scaled["queries"], base["queries"]

print(f"scaled: {scaled['sf']}  total={scaled['value']:.1f}s  "
      f"n={len(sq)}  skips={scaled.get('skips', {})}")
print(f"base:   {base['sf']}  total={base['value']:.1f}s  n={len(bq)}")
missing = sorted(set(bq) - set(sq))
if missing:
    print(f"MISSING at scaled SF ({len(missing)}): {', '.join(missing)}")

rows = [(k, v, bq.get(k), (v / bq[k]) if bq.get(k) else None)
        for k, v in sq.items()]
print(f"\n== top {top_n} slowest at scaled SF ==")
for k, v, b, r in sorted(rows, key=lambda t: -t[1])[:top_n]:
    print(f"{k:34s} {v:8.2f}s  base {b if b else float('nan'):6.2f}s  "
          f"ratio {r if r else float('nan'):6.1f}x")

print("\n== ratio outliers (ratio > 10x) ==")
for k, v, b, r in sorted(rows, key=lambda t: -(t[3] or 0)):
    if r and r > 10:
        tag = "WEAK" if r > 50 else "WATCH"
        print(f"{k:34s} ratio {r:6.1f}x  ({b:.2f}s -> {v:.2f}s)  {tag}")
