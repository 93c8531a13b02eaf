#!/usr/bin/env python3
"""Dev tooling: per-query delta table between two bench_full.json files
(e.g. the committed r13 snapshot vs a fresh r14 run, or sf0.1 vs sf1).

Usage: python3 tools/bench_delta.py OLD.json NEW.json [ratio_flag=1.5]
           [--normalize] [--bands PATH] [--no-bands]

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

Noise-band auto-adjudication (VERDICT r13 #1b): when
fixtures/bench_noise_bands.json exists (mined from committed same-tree
capture pairs by tools/make_noise_bands.py), a flagged delta whose
adjusted ratio sits INSIDE that query's demonstrated same-tree
cross-capture band is reported as within-band and does NOT count toward
the needs-attention verdict — the machine has already shown it moves
that query that much on identical code. Exceeding deltas remain flagged
exactly as before. --no-bands restores the raw behavior.
"""
import json
import os
import statistics
import sys

argv = sys.argv[1:]
normalize = "--normalize" in argv
no_bands = "--no-bands" in argv
bands_path = "fixtures/bench_noise_bands.json"
if "--bands" in argv:
    i = argv.index("--bands")
    if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
        sys.exit("usage: --bands needs a file path")
    bands_path = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
args = [a for a in argv if a not in ("--normalize", "--no-bands")]
old = json.load(open(args[0]))
new = json.load(open(args[1]))
flag = float(args[2]) if len(args) > 2 else 1.5

bands, default_band = {}, None
if not no_bands and os.path.exists(bands_path):
    bdoc = json.load(open(bands_path))
    bands = {q: b["band"] for q, b in bdoc["bands"].items()}
    default_band = bdoc.get("default_band", 1.5)

for side, doc in (("OLD", old), ("NEW", new)):
    if doc.get("capture_contended"):
        print(f"WARNING: {side} capture is stamped capture_contended — "
              "its numbers measure the contention, not the code")

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

candidates = [(adj, r, a, b, k) for adj, r, a, b, k in rows
              if adj > flag and (a >= 0.05 or b - a > 0.2)]
flagged, inband = [], []
for adj, r, a, b, k in candidates:
    band = bands.get(k, default_band) if (bands or default_band) else None
    if band is not None and adj <= band:
        inband.append((adj, r, a, b, k, band))
    else:
        flagged.append((adj, r, a, b, k, band))

print(f"old total {old['value']}s / {old['n_queries']}q   "
      f"new total {new['value']}s / {new['n_queries']}q"
      + (f"   [old agg {old.get('agg', 'min_of_2')},"
         f" new agg {new.get('agg', 'min_of_2')}]"))
if normalize:
    print(f"median drift {drift:.3f}x (divided out of adjusted ratios)")
if bands:
    print(f"noise bands: {bands_path} ({len(bands)} queries, "
          f"default {default_band}x)")
print(f"flagged (> {flag}x{' after drift-normalization' if normalize else ''}"
      f"{', exceeding noise band' if bands else ''}): {len(flagged)}")
for adj, r, a, b, k, band in flagged:
    extra = f"  [band {band}x]" if band is not None else ""
    print(f"  {adj:6.2f}x (raw {r:5.2f}x)  {a:7.3f} -> {b:7.3f}  {k}{extra}")
if inband:
    print(f"within historical same-tree noise band (auto-adjudicated, "
          f"not flagged): {len(inband)}")
    for adj, r, a, b, k, band in inband:
        print(f"  {adj:6.2f}x (raw {r:5.2f}x)  {a:7.3f} -> {b:7.3f}  {k}"
              f"  [band {band}x]")
if bands:
    print("VERDICT: " + ("CLEAN — every delta inside demonstrated "
                         "same-tree capture noise" if not flagged else
                         f"{len(flagged)} delta(s) exceed their noise band — "
                         "needs code-level adjudication"))
print("\nfull table (adjusted-ratio desc):")
for adj, r, a, b, k in rows:
    print(f"  {adj:6.2f}x (raw {r:5.2f}x)  {a:7.3f} -> {b:7.3f}  {k}")
only_new = sorted(set(qn) - set(qo))
if only_new:
    print(f"\nnew-only queries: {only_new}")
