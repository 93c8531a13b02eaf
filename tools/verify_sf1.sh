#!/usr/bin/env bash
# One-command sf1 (10x sf0.1) gate: derive the fixture, run the full
# 191-query correctness gate against the DuckDB oracle, and bench.
# Exits 0 iff every query passes. This is the reproducible form of the
# round-7 "191/191 at sf1" claim (SCALE.md): everything below derives
# from the committed repo + /root/testdata/sf0.1.
#
# Usage: tools/verify_sf1.sh [sf1Dir=/tmp/graft_sf1] [--skip-bench]
#
# Outputs:
#   $sf1Dir                     derived 10x parquet (deterministic seeds)
#   /tmp/graft_verify_sf1       Spark query dumps + oracle_sql.json
#   bench_sf1.json              one-line bench snapshot (unless --skip-bench)
set -euo pipefail
cd "$(dirname "$0")/.."

# flag-anywhere arg parsing: `verify_sf1.sh --skip-bench` must keep the
# default dir, not create a fixture directory literally named
# './--skip-bench' and run the bench anyway
SF1=/tmp/graft_sf1
SKIP_BENCH=0
for a in "$@"; do
  case "$a" in
    --skip-bench) SKIP_BENCH=1 ;;
    --*) echo "unknown flag: $a (did you mean --skip-bench?)" >&2; exit 2 ;;
    *) SF1="$a" ;;
  esac
done
OUT=/tmp/graft_verify_sf1

if [ ! -f "$SF1/embeddings.parquet" ]; then
  echo "[verify_sf1] deriving sf1 at $SF1"
  python3 tools/make_sf1.py "$SF1"
else
  echo "[verify_sf1] reusing existing $SF1"
fi

echo "[verify_sf1] running graft.Verify at sf1"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF1 $OUT"

LEDGER="${GRAFT_SF1_LEDGER:-CORRECTNESS_sf1.json}"
echo "[verify_sf1] DuckDB oracle compare -> $LEDGER"
python3 tools/verify_local.py "$SF1" "$OUT" --ledger "$LEDGER" | tail -3

if [[ "$SKIP_BENCH" != "1" ]]; then
  echo "[verify_sf1] bench at sf1 -> bench_sf1.json"
  BENCH_RC=0
  SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_OUT=bench_sf1.json \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
    || BENCH_RC=$?
  # fold per-query sf1/sf0.1 wall ratios into the ledger: the committed
  # artifact then carries BOTH halves of the scale claim (correct at 10x,
  # and how the wall scaled) — VERDICT r8 §next-2. A failed bench is
  # recorded as such, NEVER papered over with a stale bench_sf1.json.
  python3 - "$LEDGER" "$BENCH_RC" <<'PY'
import json, sys
ledger_path, bench_rc = sys.argv[1], int(sys.argv[2])
led = json.load(open(ledger_path))
led["bench_rc"] = bench_rc
if bench_rc != 0:
    led["ratio_note"] = "bench FAILED this run; no ratios folded"
else:
    try:
        b01 = json.load(open("bench_full.json"))
        b1 = json.load(open("bench_sf1.json"))
        a01 = b01.get("agg", "min_of_2")
        a1 = b1.get("agg", "min_of_2")
        led["bench_total_sec_sf1"] = b1["value"]
        led["agg_sf01"], led["agg_sf1"] = a01, a1
        if a01 != a1:
            # median/min mixes systematically skew every ratio — refuse
            # to publish a biased table (refresh bench_full.json on the
            # same tree first)
            led["ratio_note"] = (f"SKIPPED: aggregation mismatch "
                                 f"(sf0.1={a01}, sf1={a1}) would bias ratios")
        else:
            ratios = {}
            for q, t1 in b1["queries"].items():
                t0 = b01["queries"].get(q)
                if t0 and t0 > 0 and t1 > 0:
                    ratios[q] = round(t1 / t0, 2)
            led["sf1_over_sf01_ratio"] = dict(
                sorted(ratios.items(), key=lambda kv: -kv[1]))
            led["worst_ratio"] = max(ratios.values()) if ratios else None
    except FileNotFoundError as e:
        led["ratio_note"] = f"no ratio table: {e}"
json.dump(led, open(ledger_path, "w"), indent=1)
print(f"[verify_sf1] ledger folded -> {ledger_path}")
PY
fi
echo "[verify_sf1] OK"
