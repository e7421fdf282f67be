#!/bin/bash
# Round-13 century rehearsal (VERDICT r12 #6): BenchOne min-of-3 over
# the most expensive data-bound ops at sf10 = 100 x sf0.1 (de-biased
# make_sf.py construction, factor 100).
set -uo pipefail
export SPARK_GRAFT_SF_DIR="${1:-/root/repo/target/sfx/sf10}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-80g}"
QS=(wc_betweenness wc_random_walks wc_pagerank wc_lpa_communities
    wc_wcc_sizes ann_nndescent_knn dd_cluster dd_near_dedup_corpus
    dd_minhash_lsh pipe_near_decontaminate pipe_tfidf rel_terasort)
for q in "${QS[@]}"; do
  echo "=== $q ==="
  timeout 3000 /root/repo/tools/bench_one.sh "$q" 3 2>/dev/null | tail -1 \
    || echo "$q TIMED OUT OR FAILED"
done
