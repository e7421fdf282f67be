#!/usr/bin/env python3
"""Replicate a testdata SF directory N x with shifted keys (driver-side
scale-rehearsal aid, NOT library code). Copy 0 is byte-identical to the
source; copy i shifts every entity key by i * (max_key + 1), so foreign
keys stay consistent inside each copy and the result is N disjoint,
semantically identical shards -- near-linear scaling is then the
EXPECTED outcome for scans/keyed aggs, and deviations are the signal.

Document texts are NOT replicated verbatim (round-10 de-bias): copy
i > 0 replaces every 5th token (at a copy-dependent offset) with a
filler from a fixed 7-word pool, so a copy shares ~80% of its token
positions (and ~half its 3-shingles) with the source doc instead of
being an exact replica, and copies of one doc differ from each other
too. Deterministic (pure function of (text, i)), so reruns are
byte-stable; n_chars is recomputed for perturbed copies; the filler
pool is FIXED so the scaled vocabulary stays bounded (base + 7 — the
SpaceSaving exact-degeneration rows need vocabulary <= 64 at every
factor). This kills the round-9 pathology where every doc gained N-1
EXACT replicas and the dedup family measured a harsher-than-linear
constructed workload.

--skew additionally makes the corpus zipf-hot (round-10 skew
rehearsal): a deterministic per-row hash routes ~20% of orders to ONE
customer (key 0), ~20% of lineitems to ONE part, and ~20% of events to
ONE user -- the hot-key regime a uniform TPC-H-ish corpus never
exercises. FKs stay valid (key 0 exists in every entity space).

--firehose is the round-11 single-entity rehearsal: ~80% of events
route to ONE user (key 0) -- the pathological one-entity feed the
per-user session windows serialize through one task, which the
graft.session.skewsafe code path exists for. Composable with --skew
(orders/lineitem keep their 20% routes; events take the 80% route).

--boilerplate is the round-13 hot-band-bucket rehearsal (VERDICT r12
#3): every 10th document's text (ALL copies, keyed on the pre-shift
doc_id) is replaced by a fixed 60-token boilerplate drawn from the
SAME bounded qq-pool plus the doc's first two original tokens -- a
boilerplate-heavy corpus whose near-identical shingle sets collapse
thousands of docs into the same MinHash band buckets, the LSH
candidate-join failure mode no uniform corpus exercises. Vocabulary
stays bounded (the qq pool is reused, no new types).

Usage: make_sf.py <src_dir> <dst_dir> <factor> [--skew] [--firehose] [--boilerplate]
"""
import sys
import duckdb

FLAGS = {"--skew", "--firehose", "--boilerplate"}
args = [a for a in sys.argv[1:] if a not in FLAGS]
SKEW = "--skew" in sys.argv[1:]
FIREHOSE = "--firehose" in sys.argv[1:]
BOILERPLATE = "--boilerplate" in sys.argv[1:]
src, dst, n = args[0], args[1], int(args[2])
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

# --skew / --firehose: (table, column) -> deterministic per-row
# hot-key routing. Knuth multiplicative hash of a per-row key;
# < pct of 100 -> key 0. --firehose raises the events route to 80%
# (and enables ONLY it unless --skew is also given).
HOT_PCT = 20
SKEW_ROUTE = {
    ("orders", "o_custkey"): "(t.o_orderkey * 2654435761) % 100",
    ("lineitem", "l_partkey"):
        "((t.l_orderkey * 2654435761) + t.l_partkey * 40503) % 100",
    ("events", "user_id"): "(t.event_id * 2654435761) % 100",
}
def hot_pct(tbl, col):
    if FIREHOSE and (tbl, col) == ("events", "user_id"):
        return 80
    if SKEW:
        return HOT_PCT
    return None  # route disabled

# Copy-indexed token perturbation for document text (i = copy index;
# 1-based token index j). Every 5th position (offset varies per copy
# mod 5) is REPLACED with a filler from a FIXED 7-word pool, indexed
# by (j + i) mod 7 so two copies of one doc only coincide when
# i1 = i2 (mod 35) — never within practical factors. Replacement,
# not suffixing, keeps the scaled corpus's vocabulary bounded
# (+7 types), which the SpaceSaving exact-degeneration rows
# (HeavyHitterExactCap = 64 >= vocabulary) depend on at every factor.
PERTURB_TEXT = """CASE WHEN i = 0 THEN t.text ELSE
  array_to_string(
    list_transform(string_split(t.text, ' '),
      (w, j) -> CASE WHEN (j + i) % 5 = 0
                THEN 'qq' || CAST((j + i) % 7 AS VARCHAR) ELSE w END),
    ' ') END"""

# --boilerplate: the fixed 60-token pattern (qq pool only) + the
# doc's first two original tokens as the distinctive tail.
BP_PATTERN = " ".join("qq%d" % (k % 7) for k in range(60))
if BOILERPLATE:
    PERTURB_TEXT = f"""CASE WHEN t.doc_id % 10 = 0 THEN
  '{BP_PATTERN} ' ||
  array_to_string(string_split(t.text, ' ')[1:2], ' ')
ELSE {PERTURB_TEXT} END"""

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
        if tbl == "documents" and c == "text":
            return f"CAST({PERTURB_TEXT} AS {types[c]}) AS {c}"
        if tbl == "documents" and c == "n_chars":
            # keep the metadata honest on perturbed copies
            if BOILERPLATE:
                return f"CAST(length({PERTURB_TEXT}) AS {types[c]}) AS {c}"
            return (f"CAST(CASE WHEN i = 0 THEN t.n_chars "
                    f"ELSE length({PERTURB_TEXT}) END AS {types[c]}) AS {c}")
        return f"t.{c}"
    def shifted(c):
        base = f"t.{c} + i * {stride[shifts[c]]}"
        pct = hot_pct(tbl, c) if (tbl, c) in SKEW_ROUTE else None
        if pct is not None:
            base = (f"CASE WHEN {SKEW_ROUTE[(tbl, c)]} < {pct} "
                    f"THEN 0 ELSE {base} END")
        return f"CAST({base} AS {types[c]}) AS {c}"
    if not shifts:  # fixed dimension tables: single copy
        sel0 = ", ".join(passthrough(c) for c in cols)
        con.execute(f"COPY (SELECT {sel0} FROM '{src}/{tbl}.parquet' t) TO "
                    f"'{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        continue
    sel = ", ".join(
        shifted(c) if c in shifts else passthrough(c) for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM '{src}/{tbl}.parquet' t CROSS JOIN copies "
        f"ORDER BY i) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
    got = con.execute(f"SELECT count(*) FROM '{dst}/{tbl}.parquet'").fetchone()[0]
    want = n * con.execute(f"SELECT count(*) FROM '{src}/{tbl}.parquet'").fetchone()[0]
    assert got == want, (tbl, got, want)
print(f"wrote {dst} at {n}x {src}" +
      (" [skew]" if SKEW else "") + (" [firehose]" if FIREHOSE else "") +
      (" [boilerplate]" if BOILERPLATE else ""))
