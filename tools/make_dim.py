#!/usr/bin/env python3
"""Rewrite a testdata SF directory's embeddings at a different
dimension (driver-side dimension-sensitivity rehearsal aid, NOT
library code) — the §5.1d companion to make_sf.py: make_sf scales n
with everything else fixed; this scales DIM with everything else
fixed, so the two slopes factor the ANN family's cost model
(n-bound candidate generation vs dim-bound distance arithmetic and
dim-bound centroid broadcast).

Every non-embeddings table is copied byte-identical. embeddings keeps
the SAME vec_ids and label rule (vec_id % 10 matches the source
generator's range) and mints dim-D float components from a closed
form, g(id, j) = ((id*1009 + j*917) % 2001 - 1000) / 2000.0 — the
same [-0.5, 0.5] envelope as the source corpus, deterministic so
reruns are byte-stable. No query constant in the engine depends on
dim (PQ subvector splits read the array length; Lloyd seeds read
rows), so the registry runs unchanged.

Usage: make_dim.py <src_dir> <dst_dir> <dim>
"""
import os
import shutil
import sys

import duckdb

src, dst, dim = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET timezone = 'UTC'")

for f in sorted(os.listdir(src)):
    if not f.endswith(".parquet"):
        continue
    if f == "embeddings.parquet":
        continue
    shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))

con.execute(f"""
COPY (
  SELECT vec_id,
    list_transform(range(0, {dim}),
      j -> CAST(((vec_id*1009 + j*917) % 2001 - 1000) / 2000.0 AS FLOAT))
      AS embedding,
    CAST(vec_id % 10 AS INTEGER) AS label
  FROM '{src}/embeddings.parquet'
  ORDER BY vec_id
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT count(*), max(len(embedding)) FROM '{dst}/embeddings.parquet'").fetchone()
print(f"wrote {dst}/embeddings.parquet rows={n[0]} dim={n[1]}")
