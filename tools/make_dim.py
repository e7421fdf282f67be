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
form, g(id, j) = ((id*1009 + j*917 + id*j*37) % 2003 - 1001) / 2003.0
— the same [-0.5, 0.5] envelope as the source corpus, deterministic
so reruns are byte-stable. The id*j interaction term matters: a pure
lattice (id*a + j*b) makes vectors of nearby ids differ by a near-
constant offset (cosine > 0.9 natural pairs), which breaks the
exact-recall precondition of the sign-LSH oracle; with the mixer the
max natural cosine is ~0.59 (checked by brute force at dim 512,
n=500), comfortably under every threshold in the registry.

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
      j -> CAST(((vec_id*1009 + j*917 + vec_id*j*37) % 2003 - 1001)
                / 2003.0 AS FLOAT)) AS embedding,
    CAST(vec_id % 10 AS INTEGER) AS label
  FROM '{src}/embeddings.parquet'
  ORDER BY vec_id
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT count(*), max(len(embedding)) FROM '{dst}/embeddings.parquet'").fetchone()
print(f"wrote {dst}/embeddings.parquet rows={n[0]} dim={n[1]}")
