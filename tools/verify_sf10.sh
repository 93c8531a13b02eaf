#!/usr/bin/env bash
# Third-decade headroom gate (VERDICT r11 next-6): derive an sf10
# (100x sf0.1) fixture and run the correctness pass for the top-15
# sf3/sf1 wall-ratio queries — rules 11/12 and the banding/cap fixes
# were each caught only by moving to the NEXT scale factor, so every
# decade gets its own gate. Subset composition: the sf3 ledger's
# top-ratio queries MINUS the two declared exact baselines
# (dedup_ngram_jaccard, dedup_embedding_cosine — demoted to
# correctness-baseline-only in r12, SCALE.md; their engine sides alone
# are Omega(n^2)-candidate at 200k vectors / 500k docs and say nothing
# about the SCALE paths this gate audits), topped back up to 15 with
# the next-ranked queries (dedup_simhash, text_tfidf_top).
#
# Usage: tools/verify_sf10.sh [sf10Dir=/tmp/graft_sf10] [--skip-bench]
#
# Outputs:
#   $sf10Dir                 derived 100x parquet (deterministic seeds,
#                            replicas 0-29 extend the sf3 fixture)
#   /tmp/graft_verify_sf10   Spark query dumps + pruned oracle_sql.json
#   CORRECTNESS_sf10_r12.json  per-query verdicts + sf10/sf3 wall ratios
#   bench_sf10.json          subset bench snapshot (unless --skip-bench)
set -euo pipefail
cd "$(dirname "$0")/.."

SF10=/tmp/graft_sf10
SKIP_BENCH=0
for a in "$@"; do
  case "$a" in
    --skip-bench) SKIP_BENCH=1 ;;
    --*) echo "unknown flag: $a (did you mean --skip-bench?)" >&2; exit 2 ;;
    *) SF10="$a" ;;
  esac
done
OUT=/tmp/graft_verify_sf10
LEDGER="${GRAFT_SF10_LEDGER:-CORRECTNESS_sf10_r15.json}"

# 128 GiB fit, pre-verified (SCALE.md memory math): the dominant
# resident sets at sf10 are documents (500k rows x ~2 KB ~= 1 GiB),
# embeddings (200k x 128 floats ~= 100 MiB raw, ~4x that as rows),
# the IVF-family localCheckpoint blocks (candidates only, banded:
# N*cellCap/2 pair rows ~= 13M x ~50 B ~= 650 MiB), and 32 concurrent
# shuffle-hash builds over 1/32 slices. 16g held at sf3; 48g gives the
# 3.3x scale-up the same >2x headroom without approaching the 128 GiB
# box.
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"

# DuckDB oracle resource caps (verify_local.py honors these): the
# IVF-family oracles at 200k vectors build ~1e8-row intermediates.
# Uncapped, DuckDB ran to the RAM ceiling (OOM-killed at 116 GiB) and
# spilled into the repo cwd until the disk filled — r12 first attempt.
# 96GB since r13: safe now that GRAFT_ISOLATE gives each oracle its own
# process (no cross-query allocator accumulation); text_exactsubstr_dedup
# is borderline-over 64GB standalone at 500k docs.
export GRAFT_DUCKDB_MEM="${GRAFT_DUCKDB_MEM:-96GB}"
export GRAFT_DUCKDB_TEMP="${GRAFT_DUCKDB_TEMP:-/tmp/duckdb_spill}"
export GRAFT_DUCKDB_THREADS="${GRAFT_DUCKDB_THREADS:-16}"

if [ ! -f "$SF10/embeddings.parquet" ]; then
  echo "[verify_sf10] deriving sf10 at $SF10"
  python3 tools/make_sf1.py "$SF10" 100
else
  echo "[verify_sf10] reusing existing $SF10"
fi

# r13 extension (VERDICT r12 next-2): the MinHash/LSH family — the #1
# wall-time family, whose banding-join candidate growth is the engine's
# biggest 100 TB bet — joins the gate with its four members
# (dedup_clusters, dedup_minhash_lsh, dedup_ngram_capped,
# dedup_simhash_pairs).
#
# r14 extension (VERDICT r13 next-5): the relational family's top
# wall-time queries join — the TPC-H-shaped joins previously topped out
# at sf1 evidence. At sf10 lineitem is ~60M rows; the interesting
# questions are whether the salted join's salt factor still bounds skew
# and whether the EXISTS semi-join shape scales.
#
# r15 extension (VERDICT r14 next-7): the iterative family joins —
# q_pagerank, q_bfs_hops, q_er_resolve (dedup_clusters was already in).
# The r14 round's biggest wins (localCheckpoint pins, size-aware
# broadcast hints, the r15 above-threshold partitioned-pin switch)
# rested on sf0.1/sf1 evidence; the 100 TB claim needs the third
# decade. Subset is now 27.
SUBSET="sim_knn_classify,sim_ann_ivf,dedup_semantic,dedup_embedding_blocked,sim_cosine_topk,sim_kmeans,text_contamination,text_exactsubstr_dedup,sim_knn_graph,text_duplicate_spans,sim_pq_adc,sim_srp_hamming,text_winnowing,dedup_simhash,text_tfidf_top,dedup_clusters,dedup_minhash_lsh,dedup_ngram_capped,dedup_simhash_pairs,q3_top_revenue_orders,q5_region_revenue,q17_small_quantity,q_exists_returns,q_salted_join,q_pagerank,q_bfs_hops,q_er_resolve"
echo "[verify_sf10] subset: $SUBSET"

echo "[verify_sf10] running graft.Verify at sf10 (subset)"
rm -rf "$OUT"
SPARK_GRAFT_ONLY="$SUBSET" sbt -batch "runMain graft.Verify $SF10 $OUT"

# prune oracle_sql.json to the subset (verify_local.py fails on oracle
# entries whose Spark output was deliberately not produced)
python3 - "$OUT" "$SUBSET" <<'PY'
import json, sys
out, subset = sys.argv[1], set(sys.argv[2].split(","))
path = f"{out}/oracle_sql.json"
oracle = json.load(open(path))
pruned = {k: v for k, v in oracle.items() if k in subset}
json.dump(pruned, open(path, "w"))
print(f"[verify_sf10] oracle pruned to {len(pruned)} entries")
PY

echo "[verify_sf10] DuckDB oracle compare -> $LEDGER"
GRAFT_ISOLATE=1 PYTHONUNBUFFERED=1 python3 tools/verify_local.py "$SF10" "$OUT" --ledger "$LEDGER" | tee /tmp/verify_sf10_oracle.log | tail -3

if [[ "$SKIP_BENCH" != "1" ]]; then
  # SAME-TREE sf3 reference capture: the committed bench_sf3.json
  # predates whatever the current tree changed (r12: the assignment-
  # kernel rounding fix moved the whole IVF family ~3x), so folding
  # sf10 against it would bias every affected ratio. Both halves of
  # the ratio come from THIS tree, back to back, same session.
  echo "[verify_sf10] same-tree sf3 subset bench -> bench_sf3_r14.json"
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf3 SPARK_GRAFT_BENCH_OUT=bench_sf3_r14.json \
    SPARK_GRAFT_ONLY="$SUBSET" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
  echo "[verify_sf10] subset bench at sf10 -> bench_sf10.json"
  BENCH_RC=0
  SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_BENCH_OUT=bench_sf10.json \
    SPARK_GRAFT_ONLY="$SUBSET" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
    || BENCH_RC=$?
  # fold sf10/sf3 wall ratios (expected ~3.3x for linear queries)
  python3 - "$LEDGER" "$BENCH_RC" <<'PY'
import json, sys
ledger_path, bench_rc = sys.argv[1], int(sys.argv[2])
led = json.load(open(ledger_path))
led["bench_rc"] = bench_rc
led["scale"] = ("sf10 = 100x sf0.1; ratios below are sf10/sf3 wall "
                "(linear = ~3.33)")
led["subset_note"] = (
    "top-15 sf3/sf1 ratio queries excluding the two declared exact "
    "baselines (demoted correctness-baseline-only in r12; their "
    "engine-side Omega(n^2)-candidate cost at 200k vectors / 500k docs "
    "audits the declared baseline, not a scale path), topped up with "
    "dedup_simhash and text_tfidf_top; r13 adds the four MinHash/LSH-"
    "family queries (dedup_clusters, dedup_minhash_lsh, "
    "dedup_ngram_capped, dedup_simhash_pairs) per VERDICT r12 next-2; "
    "r14 adds the relational family's top wall-time queries "
    "(q3_top_revenue_orders, q5_region_revenue, q17_small_quantity, "
    "q_exists_returns, q_salted_join) per VERDICT r13 next-5 — "
    "~60M-row lineitem, salted-join skew bound and EXISTS semi-join "
    "measured at the third decade")
if bench_rc != 0:
    led["ratio_note"] = "bench FAILED this run; no ratios folded"
else:
    try:
        b3 = json.load(open("bench_sf3_r14.json"))
        b10 = json.load(open("bench_sf10.json"))
        a3, a10 = b3.get("agg", "min_of_2"), b10.get("agg", "min_of_2")
        led["bench_total_sec_sf10_subset"] = b10["value"]
        led["agg_sf3"], led["agg_sf10"] = a3, a10
        if a3 != a10:
            led["ratio_note"] = (f"SKIPPED: aggregation mismatch "
                                 f"(sf3={a3}, sf10={a10}) would bias ratios")
        else:
            ratios = {}
            for q, t10 in b10["queries"].items():
                t3 = b3["queries"].get(q)
                if t3 and t3 > 0 and t10 > 0:
                    ratios[q] = round(t10 / t3, 2)
            led["sf10_over_sf3_ratio"] = dict(
                sorted(ratios.items(), key=lambda kv: -kv[1]))
            led["worst_ratio"] = max(ratios.values()) if ratios else None
    except FileNotFoundError as e:
        led["ratio_note"] = f"no ratio table: {e}"
json.dump(led, open(ledger_path, "w"), indent=1)
print(f"[verify_sf10] ledger folded -> {ledger_path}")
PY
fi
echo "[verify_sf10] OK"
