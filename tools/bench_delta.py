#!/usr/bin/env python3
"""Dev tooling: per-query delta table between two bench_full.json files
(e.g. the committed r6 snapshot vs a fresh r7 run, or sf0.1 vs sf1).

Usage: python3 tools/bench_delta.py OLD.json NEW.json [ratio_flag=1.5]

Prints queries sorted by ratio (new/old), flagging anything above the
threshold, plus totals. Sub-50ms entries are noise-suppressed (flagged
only if they also grew by >0.2s absolute).
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

qo, qn = old["queries"], new["queries"]
rows = []
for k, b in qn.items():
    a = qo.get(k)
    if a is None or a <= 0 or b <= 0:
        continue
    rows.append((b / a, a, b, k))
rows.sort(key=lambda r: -r[0])

flagged = [(r, a, b, k) for r, a, b, k in rows
           if r > flag and (a >= 0.05 or b - a > 0.2)]
print(f"old total {old['value']}s / {old['n_queries']}q   "
      f"new total {new['value']}s / {new['n_queries']}q")
print(f"flagged (> {flag}x): {len(flagged)}")
for r, a, b, k in flagged:
    print(f"  {r:6.2f}x  {a:7.3f} -> {b:7.3f}  {k}")
print("\nfull table (ratio desc):")
for r, a, b, k in rows:
    print(f"  {r:6.2f}x  {a:7.3f} -> {b:7.3f}  {k}")
only_new = sorted(set(qn) - set(qo))
if only_new:
    print(f"\nnew-only queries: {only_new}")
