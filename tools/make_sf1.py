#!/usr/bin/env python3
"""Dev tooling: build a 10x scale-up of /root/testdata/sf0.1 for the sf1
headroom pass (VERDICT r6 item 5). The driver ships no sf1 fixture, so
this derives one from sf0.1 deterministically:

- dimensions (region/nation/customer/supplier/part) copy unchanged —
  fact-side growth against fixed dims is exactly the 100 TB shape;
- fact tables (orders/lineitem/events) replicate 10x with key offsets
  (orderkey/event_id/user_id shifted per replica), preserving every
  per-key distribution while scaling row counts;
- documents replicate 10x with a per-replica seeded word shuffle, so
  lengths/vocabulary/language mix are preserved but replicas are NOT
  near-duplicates of each other (an identical-copy replication would
  make every LSH bucket a 10-clique and measure a pathology, not scale);
- embeddings replicate 10x with deterministic bounded noise (~5% of the
  typical coordinate scale), preserving label/cluster structure.

Correctness at sf1 is still oracle-checked: verify_local.py runs DuckDB
on the SAME derived parquet, so the gate is engine-vs-engine equality,
independent of how the data was derived.

Usage: python3 tools/make_sf1.py [outDir=/tmp/graft_sf1] [reps=10]

The optional reps arg generalizes the same derivation to other scale
points — e.g. `make_sf1.py /tmp/graft_sf3 30` builds the sf3 (30x sf0.1)
fixture for the round-11 second-decade headroom gate. Key offsets,
word-shuffle seeds and noise seeds are all (row, rep)-deterministic, so
replicas beyond the first 10 extend the sf1 fixture, never perturb it.
"""
import os
import random
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# dims: straight copies
for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"{t}: copied")

def scan(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

# orders / lineitem: replicate with orderkey offsets (same customers/parts)
omax = con.sql(f"SELECT max(o_orderkey)+1 FROM {scan('orders')}").fetchone()[0]
parts = " UNION ALL ".join(
    f"SELECT o_orderkey + {r * omax} AS o_orderkey, o_custkey, o_orderstatus, "
    f"o_totalprice, o_orderdate, o_orderpriority FROM {scan('orders')}"
    for r in range(REPS))
con.sql(f"COPY ({parts}) TO '{OUT}/orders.parquet' (FORMAT PARQUET)")
print("orders: replicated")

parts = " UNION ALL ".join(
    f"SELECT l_orderkey + {r * omax} AS l_orderkey, l_partkey, l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate FROM {scan('lineitem')}"
    for r in range(REPS))
con.sql(f"COPY ({parts}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)")
print("lineitem: replicated")

# events: new event ids AND new users per replica (user count scales 10x,
# per-user behavior preserved)
emax = con.sql(f"SELECT max(event_id)+1 FROM {scan('events')}").fetchone()[0]
umax = con.sql(f"SELECT max(user_id)+1 FROM {scan('events')}").fetchone()[0]
parts = " UNION ALL ".join(
    f"SELECT event_id + {r * emax} AS event_id, ts, user_id + {r * umax} AS user_id, "
    f"event_type, value, props FROM {scan('events')}"
    for r in range(REPS))
con.sql(f"COPY ({parts}) TO '{OUT}/events.parquet' (FORMAT PARQUET)")
print("events: replicated")

# documents: word-shuffle per replica (replica 0 = original corpus)
rows = con.sql(f"SELECT doc_id, text, lang, source, n_chars FROM {scan('documents')} "
               "ORDER BY doc_id").fetchall()
dmax = max(r[0] for r in rows) + 1
out_rows = []
for rep in range(REPS):
    for (doc_id, text, lang, source, n_chars) in rows:
        if rep == 0:
            out_rows.append((doc_id, text, lang, source, n_chars))
        else:
            words = text.split(" ")
            random.Random(doc_id * 1000 + rep).shuffle(words)
            t2 = " ".join(words)
            out_rows.append((doc_id + rep * dmax, t2, lang, source, len(t2)))
con.sql("CREATE TABLE docs(doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", out_rows)
con.sql(f"COPY (SELECT * FROM docs ORDER BY doc_id) TO '{OUT}/documents.parquet' "
        "(FORMAT PARQUET)")
print(f"documents: {len(out_rows)} rows")

# embeddings: bounded deterministic noise per replica, labels preserved
erows = con.sql(f"SELECT vec_id, embedding, label FROM {scan('embeddings')} "
                "ORDER BY vec_id").fetchall()
vmax = max(r[0] for r in erows) + 1
out_rows = []
for rep in range(REPS):
    for (vec_id, emb, label) in erows:
        if rep == 0:
            out_rows.append((vec_id, emb, label))
        else:
            rng = random.Random(vec_id * 1000 + rep)
            emb2 = [float(x) + (rng.random() - 0.5) * 0.1 for x in emb]
            out_rows.append((vec_id + rep * vmax, emb2, label))
con.sql("CREATE TABLE embs(vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO embs VALUES (?,?,?)", out_rows)
con.sql(f"COPY (SELECT * FROM embs ORDER BY vec_id) TO '{OUT}/embeddings.parquet' "
        "(FORMAT PARQUET)")
print(f"embeddings: {len(out_rows)} rows")

for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"check {t}: {n} rows")
print(f"sf fixture ({REPS}x sf0.1) derived at {OUT}")
