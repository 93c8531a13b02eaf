#!/usr/bin/env python3
"""Derive per-query cross-capture noise bands from committed bench history
(VERDICT r13 #1b) and write them to fixtures/bench_noise_bands.json so
tools/bench_delta.py can auto-adjudicate deltas that live inside the
machine's demonstrated jitter instead of a human re-reading sub-second
numbers every round.

Method: walk every committed version of bench_full.json; two consecutive
versions form a SAME-TREE PAIR when no src/main or build.sbt change lies
between them (the recurring shape: the builder's round-close capture,
then the driver's post-close refresh of the identical tree hours later).
Same-tree pairs measure pure capture noise — the code cannot have moved.
Per query, the band is the worst max/min ratio ever observed across
same-tree pairs (floored at 1.30: anything can wobble 30% on a shared
VM; capped at 6.0 so one pathological window can't grant a permanent
pass). Cross-round drift is NOT used: it conflates noise with real
regressions, which is precisely what the band must not absorb.

Only median_of_3 captures participate (agg methodology changed at r9;
min_of_2 noise is not comparable).

Usage: python3 tools/make_noise_bands.py [out=fixtures/bench_noise_bands.json]
"""
import json
import statistics
import subprocess
import sys


def sh(*args):
    return subprocess.run(args, capture_output=True, text=True, check=True).stdout


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "fixtures/bench_noise_bands.json"
    commits = sh("git", "log", "--format=%H %ct", "--reverse",
                 "--", "bench_full.json").split("\n")
    commits = [c.split() for c in commits if c.strip()]

    versions = []  # (sha, epoch, {query: sec})
    for sha, ct in commits:
        try:
            doc = json.loads(sh("git", "show", f"{sha}:bench_full.json"))
        except Exception:
            continue
        if doc.get("agg") != "median_of_3":
            continue
        if doc.get("capture_contended"):
            continue  # a contended capture's jitter is not "noise", it's contention
        versions.append((sha, int(ct), {k: v for k, v in doc["queries"].items()
                                        if v and v > 0}))

    pairs = []
    for (sha_a, _, qa), (sha_b, _, qb) in zip(versions, versions[1:]):
        diff = subprocess.run(
            ["git", "diff", "--quiet", sha_a, sha_b, "--",
             "src/main", "build.sbt"], capture_output=True)
        if diff.returncode == 0:
            pairs.append((sha_a, sha_b, qa, qb))

    ratios = {}  # query -> [max/min ratio per same-tree pair]
    for sha_a, sha_b, qa, qb in pairs:
        for q in set(qa) & set(qb):
            a, b = qa[q], qb[q]
            ratios.setdefault(q, []).append(max(a, b) / min(a, b))

    all_r = sorted(r for rs in ratios.values() for r in rs)
    # default for queries with no same-tree history: the p90 of every
    # observed per-pair ratio — new queries get the fleet-typical band,
    # not a free pass
    default = round(all_r[int(len(all_r) * 0.9)], 2) if all_r else 1.5

    bands = {}
    for q, rs in sorted(ratios.items()):
        band = max(1.30, min(6.0, max(rs)))
        bands[q] = {"band": round(band, 2), "n_pairs": len(rs),
                    "worst": round(max(rs), 3),
                    "median": round(statistics.median(rs), 3)}

    doc = {
        "method": ("per-query worst same-tree cross-capture max/min ratio; "
                   "same-tree = consecutive committed bench_full.json "
                   "versions with no src/main or build.sbt diff between "
                   "them; floor 1.30, cap 6.0; median_of_3 captures only"),
        "pairs": [[a[:10], b[:10]] for a, b, _, _ in
                  [(p[0], p[1], None, None) for p in pairs]],
        "default_band": default,
        "n_queries": len(bands),
        "bands": bands,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"{len(pairs)} same-tree pairs, {len(bands)} queries -> {out_path}")
    print(f"default band (p90 of all ratios): {default}")
    worst = sorted(bands.items(), key=lambda kv: -kv[1]["worst"])[:12]
    for q, b in worst:
        print(f"  {b['worst']:6.2f}x (n={b['n_pairs']}, med {b['median']:.2f})  {q}")


if __name__ == "__main__":
    main()
