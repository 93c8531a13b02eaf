#!/usr/bin/env python3
"""Dev tooling: per-query delta table between two bench_full.json files
(e.g. the committed r8 snapshot vs a fresh r9 run, or sf0.1 vs sf1).

Usage: python3 tools/bench_delta.py OLD.json NEW.json [ratio_flag=1.5]
           [--normalize]

Prints queries sorted by ratio (new/old), flagging anything above the
threshold, plus totals. Sub-50ms entries are noise-suppressed (flagged
only if they also grew by >0.2s absolute).

--normalize divides every ratio by the MEDIAN ratio across all queries
before flagging. Rationale: the shared VM drifts uniformly between
captures (observed ~1.3x in round 8 — every untouched query shifted by
the same factor), and a uniform shift is machine noise, not a
regression. A real code regression is LOCALIZED: it stands out against
the median, which the drift moves but the regression barely does. The
printed table shows both the raw and the drift-adjusted ratio.
"""
import json
import statistics
import sys

args = [a for a in sys.argv[1:] if a != "--normalize"]
normalize = "--normalize" in sys.argv[1:]
old = json.load(open(args[0]))
new = json.load(open(args[1]))
flag = float(args[2]) if len(args) > 2 else 1.5

qo, qn = old["queries"], new["queries"]
rows = []
for k, b in qn.items():
    a = qo.get(k)
    if a is None or a <= 0 or b <= 0:
        continue
    rows.append((b / a, a, b, k))

drift = statistics.median(r for r, _, _, _ in rows) if (normalize and rows) else 1.0
rows = [(r / drift, r, a, b, k) for r, a, b, k in rows]
rows.sort(key=lambda r: -r[0])

flagged = [(adj, r, a, b, k) for adj, r, a, b, k in rows
           if adj > flag and (a >= 0.05 or b - a > 0.2)]
print(f"old total {old['value']}s / {old['n_queries']}q   "
      f"new total {new['value']}s / {new['n_queries']}q"
      + (f"   [old agg {old.get('agg', 'min_of_2')},"
         f" new agg {new.get('agg', 'min_of_2')}]"))
if normalize:
    print(f"median drift {drift:.3f}x (divided out of adjusted ratios)")
print(f"flagged (> {flag}x{' after drift-normalization' if normalize else ''}):"
      f" {len(flagged)}")
for adj, r, a, b, k in flagged:
    print(f"  {adj:6.2f}x (raw {r:5.2f}x)  {a:7.3f} -> {b:7.3f}  {k}")
print("\nfull table (adjusted-ratio desc):")
for adj, r, a, b, k in rows:
    print(f"  {adj:6.2f}x (raw {r:5.2f}x)  {a:7.3f} -> {b:7.3f}  {k}")
only_new = sorted(set(qn) - set(qo))
if only_new:
    print(f"\nnew-only queries: {only_new}")
