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

echo "[verify_sf1] DuckDB oracle compare"
python3 tools/verify_local.py "$SF1" "$OUT" | tail -3

if [[ "$SKIP_BENCH" != "1" ]]; then
  echo "[verify_sf1] bench at sf1 -> bench_sf1.json"
  SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_OUT=bench_sf1.json \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' || true
fi
echo "[verify_sf1] OK"
