#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only — the
engine itself is Scala/Spark; this uses the driver-side python stack).

Usage:  python3 tools/verify_local.py [sfDir] [outDir] [--ledger FILE]

Runs DuckDB on each oracle_sql.json entry with the fixture parquet files
registered under their bare table names, reads the Spark output parquet
written by `graft.Verify`, sorts columns by name, and compares values
row-by-row (exact for non-floats; floats reported with max abs diff so
boundary risk is visible). --ledger additionally writes a per-query JSON
verdict map (the committed sf1 artifact trail, VERDICT r8 §next-2)."""
import json, os, sys, glob, math
import duckdb
# Eager import: .df() lazy-imports numpy/pandas at CONVERSION time, which
# on a near-memory-limit run fails inside numpy's loader with a
# misleading "you should not try to import numpy from its source
# directory" (observed at the sf10 ledger, 105 GB DuckDB allocation).
# Importing before DuckDB takes the memory removes the class.
import numpy   # noqa: F401
import pandas  # noqa: F401

args = sys.argv[1:]
ledger_path = None
if "--ledger" in args:
    i = args.index("--ledger")
    if i + 1 >= len(args) or args[i + 1].startswith("--"):
        sys.exit("usage: verify_local.py [sfDir] [outDir] [--ledger FILE] "
                 "(--ledger needs a file path)")
    ledger_path = args[i + 1]
    args = args[:i] + args[i + 2:]
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out = args[1] if len(args) > 1 else "/tmp/graft_verify"
ledger = {}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# Resource knobs for the big-SF ledgers (sf0.01 defaults are fine): at
# sf10 the IVF-family oracles build ~1e8-row spilling intermediates;
# without a memory_limit DuckDB runs to the RAM ceiling and the OOM
# killer takes the whole process, and without a temp_directory it
# spills into the repo cwd's .tmp until the disk fills (r12 lesson).
if os.environ.get("GRAFT_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
if os.environ.get("GRAFT_DUCKDB_TEMP"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        # ONE execution per oracle: the relation API re-runs the query
        # on EVERY materialization, so fetchall + description + df was
        # 3x the full oracle cost (which tripled the sf10 spill peaks).
        # CTAS materializes once; the three reads below scan the table,
        # and DuckDB's default preserve_insertion_order keeps the
        # query's ORDER BY intact through CTAS + table scans.
        con.execute("CREATE OR REPLACE TEMP TABLE __oracle AS " + sql)
        want = con.sql("SELECT * FROM __oracle").fetchall()
        wcols = [d[0] for d in con.sql("SELECT * FROM __oracle").description]
        wdf = con.sql("SELECT * FROM __oracle").df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        ledger[name] = f"FAIL: oracle error: {e}"
        fail += 1
        continue
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        ledger[name] = "FAIL: no spark output"
        fail += 1
        continue
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE __spark AS SELECT * FROM read_parquet({files!r})")
    got = con.sql("SELECT * FROM __spark").fetchall()
    gcols = [d[0] for d in con.sql("SELECT * FROM __spark").description]
    gdf = con.sql("SELECT * FROM __spark").df()
    # Driver-parity dtype check: the driver hashes pandas-rendered values,
    # where DuckDB HUGEINT (sum of ints) and DOUBLE (floor/ceil) become
    # float64 ("500.0") while Spark longs stay int64 ("500"). An int/float
    # kind mismatch is therefore a REAL failure even when values compare
    # equal in python.
    kindmap = lambda k: "f" if k == "f" else ("i" if k in "iub" else "o")
    tfail = None
    for c in sorted(set(wcols) & set(gcols)):
        wk, gk = kindmap(wdf[c].dtype.kind), kindmap(gdf[c].dtype.kind)
        # all-NULL object columns are indistinguishable — skip
        if wk != gk and not (wdf[c].isna().all() or gdf[c].isna().all()):
            tfail = (c, wdf[c].dtype, gdf[c].dtype)
            break
    if tfail:
        print(f"FAIL {name}: dtype class mismatch col {tfail[0]}: oracle={tfail[1]} spark={tfail[2]}")
        ledger[name] = f"FAIL: dtype mismatch col {tfail[0]}"
        fail += 1
        continue
    if sorted(wcols) != sorted(gcols):
        print(f"FAIL {name}: columns differ: oracle={sorted(wcols)} spark={sorted(gcols)}")
        ledger[name] = "FAIL: columns differ"
        fail += 1
        continue
    worder = [wcols.index(c) for c in sorted(wcols)]
    gorder = [gcols.index(c) for c in sorted(gcols)]
    want2 = [[r[i] for i in worder] for r in want]
    got2 = [[r[i] for i in gorder] for r in got]
    if len(want2) != len(got2):
        print(f"FAIL {name}: row counts differ: oracle={len(want2)} spark={len(got2)}")
        ledger[name] = f"FAIL: row counts differ oracle={len(want2)} spark={len(got2)}"
        fail += 1
        continue
    bad = None
    maxfdiff = 0.0
    for i, (wr, gr) in enumerate(zip(want2, got2)):
        for j, (wv, gv) in enumerate(zip(wr, gr)):
            if isinstance(wv, float) or isinstance(gv, float):
                if wv is None or gv is None:
                    if wv is not gv:
                        bad = (i, sorted(wcols)[j], wv, gv); break
                elif math.isnan(wv) and math.isnan(gv):
                    pass
                elif wv != gv:
                    maxfdiff = max(maxfdiff, abs(wv - gv))
                    bad = (i, sorted(wcols)[j], wv, gv); break
            elif wv != gv:
                bad = (i, sorted(wcols)[j], wv, gv); break
        if bad: break
    if bad:
        print(f"FAIL {name}: first diff at row {bad[0]} col {bad[1]}: oracle={bad[2]!r} spark={bad[3]!r} (maxfdiff={maxfdiff})")
        ledger[name] = f"FAIL: first diff at row {bad[0]} col {bad[1]}"
        fail += 1
    else:
        print(f"PASS {name}: {len(want2)} rows")
        ledger[name] = f"pass ({len(want2)} rows)"
print(f"\n{len(oracle) - fail}/{len(oracle)} queries pass")
if ledger_path:
    json.dump({"sf": sf, "n_total": len(oracle), "n_pass": len(oracle) - fail,
               "queries": dict(sorted(ledger.items()))},
              open(ledger_path, "w"), indent=1)
    print(f"ledger -> {ledger_path}")
sys.exit(1 if fail else 0)
