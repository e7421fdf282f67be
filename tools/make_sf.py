#!/usr/bin/env python3
"""Replicate a testdata SF directory N x with shifted keys (driver-side
scale-rehearsal aid, NOT library code). Copy 0 is byte-identical to the
source; copy i shifts every entity key by i * (max_key + 1), so foreign
keys stay consistent inside each copy and the result is N disjoint,
semantically identical shards -- near-linear scaling is then the
EXPECTED outcome for scans/keyed aggs, and deviations are the signal.

Usage: make_sf.py <src_dir> <dst_dir> <factor>
"""
import sys
import duckdb

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
# The source parquet stores instant (isAdjustedToUTC) timestamps,
# which Spark reads as TIMESTAMP; DuckDB's plain TIMESTAMP writes NTZ
# and Spark then reads TIMESTAMP_NTZ, breaking unix_millis(). Rewrite
# timestamp columns as TIMESTAMPTZ under a UTC session so the stored
# instants are unchanged.
con.execute("SET timezone = 'UTC'")
con.execute(f"CREATE TABLE copies AS SELECT unnest(range({n})) AS i")

# table -> {column: key-space it references}
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "c"},
    "supplier": {"s_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}
SPACES = {
    "c": ("customer", "c_custkey"), "s": ("supplier", "s_suppkey"),
    "p": ("part", "p_partkey"), "o": ("orders", "o_orderkey"),
    "e": ("events", "event_id"), "u": ("events", "user_id"),
    "d": ("documents", "doc_id"), "v": ("embeddings", "vec_id"),
}

stride = {}
for k, (tbl, col) in SPACES.items():
    # max + 1: keys start at 0, so max alone would collide copy i's key 0
    stride[k] = con.execute(
        f"SELECT max({col}) + 1 FROM '{src}/{tbl}.parquet'").fetchone()[0]

import os
os.makedirs(dst, exist_ok=True)
for tbl, shifts in SHIFTS.items():
    cols = [c[0] for c in
            con.execute(f"DESCRIBE SELECT * FROM '{src}/{tbl}.parquet'").fetchall()]
    types = {c[0]: c[1] for c in
             con.execute(f"DESCRIBE SELECT * FROM '{src}/{tbl}.parquet'").fetchall()}
    def passthrough(c):
        if types[c] == "TIMESTAMP":
            return f"CAST(t.{c} AS TIMESTAMPTZ) AS {c}"
        return f"t.{c}"
    if not shifts:  # fixed dimension tables: single copy
        sel0 = ", ".join(passthrough(c) for c in cols)
        con.execute(f"COPY (SELECT {sel0} FROM '{src}/{tbl}.parquet' t) TO "
                    f"'{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        continue
    sel = ", ".join(
        f"CAST(t.{c} + i * {stride[shifts[c]]} AS {types[c]}) AS {c}"
        if c in shifts else passthrough(c) for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM '{src}/{tbl}.parquet' t CROSS JOIN copies "
        f"ORDER BY i) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
    got = con.execute(f"SELECT count(*) FROM '{dst}/{tbl}.parquet'").fetchone()[0]
    want = n * con.execute(f"SELECT count(*) FROM '{src}/{tbl}.parquet'").fetchone()[0]
    assert got == want, (tbl, got, want)
print(f"wrote {dst} at {n}x {src}")
