#!/usr/bin/env python3
"""Adversarial-scale corpus: deterministically upsample sf0.1 by K
id-shifted replicas (default 5 => ~sf0.5). Replicas shift the id space
(user_id, event_id, doc_id, vec_id) so per-entity structure is
preserved while entity count, duplicate-text mass (each text now
appears K times => K-deep exact-dup clusters), and id magnitudes grow —
exactly the latents (bound/overflow, id-space, dup-cluster blowup) the
per-round gate at sf0.01 cannot exercise. Tables the queries never
read (TPC-H side) are copied through so the checker's registration
still finds all ten.

Usage: python3 tools/gen_bigscale.py [outDir] [K]
"""
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 5

PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]

con = duckdb.connect()
import os
os.makedirs(OUT, exist_ok=True)


def shift(table, col):
    """Replica stride = max(id)+1 from the SOURCE parquet, so replica id
    ranges can never overlap regardless of how sf0.1 is regenerated
    (hard-coded strides silently collide if the source grows)."""
    return con.sql(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


EV_SHIFT = shift("events", "event_id")
USER_SHIFT = shift("events", "user_id")
DOC_SHIFT = shift("documents", "doc_id")
VEC_SHIFT = shift("embeddings", "vec_id")

con.sql(f"""
COPY (
  SELECT event_id + k.k * {EV_SHIFT} AS event_id, ts,
         user_id + k.k * {USER_SHIFT} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet'
  CROSS JOIN (SELECT unnest(range({K})) AS k) k
  ORDER BY user_id, event_id
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT doc_id + k.k * {DOC_SHIFT} AS doc_id, * EXCLUDE (doc_id)
  FROM '{SRC}/documents.parquet'
  CROSS JOIN (SELECT unnest(range({K})) AS k) k
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT vec_id + k.k * {VEC_SHIFT} AS vec_id, * EXCLUDE (vec_id)
  FROM '{SRC}/embeddings.parquet'
  CROSS JOIN (SELECT unnest(range({K})) AS k) k
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")
for t in PASSTHROUGH:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
for t in ["events", "documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(t, n)
