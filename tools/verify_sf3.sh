#!/usr/bin/env bash
# Second-decade headroom gate (VERDICT r10 §next-2): derive an sf3
# (30x sf0.1) fixture and run the correctness + bench pass for the
# queries where another decade of data is most likely to expose a new
# curve or a gate-blind rule: the top-30 sf1/sf0.1 wall-ratio queries
# from the committed sf1 ledger, plus the money and percentile families
# (rules 11/12 were each caught only by moving to the NEXT scale
# factor). Correctness is the same engine-vs-DuckDB-oracle equality as
# the driver gate, on the same derived parquet.
#
# Usage: tools/verify_sf3.sh [sf3Dir=/tmp/graft_sf3] [--skip-bench]
#
# Outputs:
#   $sf3Dir                      derived 30x parquet (deterministic seeds)
#   /tmp/graft_verify_sf3        Spark query dumps + pruned oracle_sql.json
#   CORRECTNESS_sf3_r11.json     per-query verdicts + sf3/sf1 wall ratios
#   bench_sf3.json               subset bench snapshot (unless --skip-bench)
set -euo pipefail
cd "$(dirname "$0")/.."

SF3=/tmp/graft_sf3
SKIP_BENCH=0
for a in "$@"; do
  case "$a" in
    --skip-bench) SKIP_BENCH=1 ;;
    --*) echo "unknown flag: $a (did you mean --skip-bench?)" >&2; exit 2 ;;
    *) SF3="$a" ;;
  esac
done
OUT=/tmp/graft_verify_sf3
LEDGER="${GRAFT_SF3_LEDGER:-CORRECTNESS_sf3_r11.json}"

if [ ! -f "$SF3/embeddings.parquet" ]; then
  echo "[verify_sf3] deriving sf3 at $SF3"
  python3 tools/make_sf1.py "$SF3" 30
else
  echo "[verify_sf3] reusing existing $SF3"
fi

# subset = top-30 sf1/sf0.1 ratios (committed ledger) + money/percentile
# families; deduplicated, order-stable
SUBSET=$(python3 - <<'PY'
import json
led = json.load(open("CORRECTNESS_sf1_r10.json"))
names = list(led["sf1_over_sf01_ratio"])[:30]
names += ["q1_pricing_summary", "q3_top_revenue_orders", "q5_region_revenue",
          "q6_forecast_revenue", "q14_promo_revenue", "q_gini_revenue",
          "q_percentile_cont", "q_mad_outliers"]
seen, out = set(), []
for n in names:
    if n not in seen:
        seen.add(n); out.append(n)
print(",".join(out))
PY
)
echo "[verify_sf3] subset: $SUBSET"

echo "[verify_sf3] running graft.Verify at sf3 (subset)"
rm -rf "$OUT"
SPARK_GRAFT_ONLY="$SUBSET" sbt -batch "runMain graft.Verify $SF3 $OUT"

# prune oracle_sql.json to the subset — verify_local.py fails on oracle
# entries whose Spark output was (deliberately) not produced. The two
# exact-pair oracles are additionally deferred by default: their DuckDB
# side is Ω(n²·d) BY CONSTRUCTION (dedup_embedding_cosine replays all
# 60 000²/2 = 1.8e9 pairs × 128-dim cosine ≈ 4.6e11 mults — probed at
# >240 s and climbing; the ENGINE side finishes in seconds because
# exactness is the declared semantics only for the baseline). Set
# GRAFT_SF3_FULL_ORACLE=1 to run them anyway (expect ~an hour each);
# otherwise they are recorded in the ledger as deferred-with-math, and
# they remain fully hash-checked at sf0.01 (driver gate) and sf1.
python3 - "$OUT" "$SUBSET" <<'PY'
import json, os, sys
out, subset = sys.argv[1], set(sys.argv[2].split(","))
heavy = {"dedup_embedding_cosine", "dedup_embedding_blocked"}
path = f"{out}/oracle_sql.json"
oracle = json.load(open(path))
full = os.environ.get("GRAFT_SF3_FULL_ORACLE") == "1"
pruned = {k: v for k, v in oracle.items()
          if k in subset and (full or k not in heavy)}
json.dump(pruned, open(path, "w"))
json.dump(sorted(heavy & subset - pruned.keys()),
          open(f"{out}/deferred_oracles.json", "w"))
print(f"[verify_sf3] oracle pruned to {len(pruned)} entries")
PY

echo "[verify_sf3] DuckDB oracle compare -> $LEDGER"
python3 tools/verify_local.py "$SF3" "$OUT" --ledger "$LEDGER" | tail -3

if [[ "$SKIP_BENCH" != "1" ]]; then
  echo "[verify_sf3] subset bench at sf3 -> bench_sf3.json"
  BENCH_RC=0
  SPARK_GRAFT_SF_DIR="$SF3" SPARK_GRAFT_BENCH_OUT=bench_sf3.json \
    SPARK_GRAFT_ONLY="$SUBSET" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
    || BENCH_RC=$?
  # fold sf3/sf1 wall ratios (expected ~3x for linear queries) — the
  # committed artifact carries both halves of the second-decade claim
  python3 - "$LEDGER" "$BENCH_RC" <<'PY'
import json, sys
ledger_path, bench_rc = sys.argv[1], int(sys.argv[2])
led = json.load(open(ledger_path))
led["bench_rc"] = bench_rc
led["scale"] = "sf3 = 30x sf0.1; ratios below are sf3/sf1 wall (linear = ~3)"
try:
    for q in json.load(open("/tmp/graft_verify_sf3/deferred_oracles.json")):
        led.setdefault(q, "DEFERRED: DuckDB oracle is Omega(n^2 * d) by "
            "construction (1.8e9 pairs x 128-dim at sf3, probed >240s); "
            "engine output produced and benched; hash-checked at sf0.01 "
            "and sf1. GRAFT_SF3_FULL_ORACLE=1 runs it.")
except FileNotFoundError:
    pass
if bench_rc != 0:
    led["ratio_note"] = "bench FAILED this run; no ratios folded"
else:
    try:
        b1 = json.load(open("bench_sf1.json"))
        b3 = json.load(open("bench_sf3.json"))
        a1, a3 = b1.get("agg", "min_of_2"), b3.get("agg", "min_of_2")
        led["bench_total_sec_sf3_subset"] = b3["value"]
        led["agg_sf1"], led["agg_sf3"] = a1, a3
        if a1 != a3:
            led["ratio_note"] = (f"SKIPPED: aggregation mismatch "
                                 f"(sf1={a1}, sf3={a3}) would bias ratios")
        else:
            ratios = {}
            for q, t3 in b3["queries"].items():
                t1 = b1["queries"].get(q)
                if t1 and t1 > 0 and t3 > 0:
                    ratios[q] = round(t3 / t1, 2)
            led["sf3_over_sf1_ratio"] = dict(
                sorted(ratios.items(), key=lambda kv: -kv[1]))
            led["worst_ratio"] = max(ratios.values()) if ratios else None
    except FileNotFoundError as e:
        led["ratio_note"] = f"no ratio table: {e}"
json.dump(led, open(ledger_path, "w"), indent=1)
print(f"[verify_sf3] ledger folded -> {ledger_path}")
PY
fi
echo "[verify_sf3] OK"
