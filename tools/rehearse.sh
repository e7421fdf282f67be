#!/bin/bash
# One-command scale rehearsal (VERDICT r13 #7): generate a rehearsal
# corpus from sf0.1, BenchOne the requested queries on it (min-of-N,
# outside sbt), and emit SURVEY §5-format table rows on stdout — so a
# §5.1/§5.1c/§5.2 row is reproducible from one incantation instead of
# incantations scattered across commit messages.
#
# Usage:
#   tools/rehearse.sh <factor> [--skew|--firehose|--boilerplate ...] \
#       [-p passes] [-b baseline_dir] <query> [query ...]
#
#   factor      make_sf.py multiplier over /root/testdata/sf0.1
#               (10 -> sf1, 100 -> sf10)
#   flags       forwarded to make_sf.py (corpus variants)
#   -p passes   BenchOne passes per query (default 3)
#   -b dir      optional second corpus to A/B against (e.g. the
#               uniform twin when rehearsing --skew); emits the ratio
#
# Corpora land under target/rehearse/<name> keyed by factor+flags and
# are REUSED if already generated (delete to regenerate).
#
# Examples:
#   tools/rehearse.sh 10 wc_pagerank dd_cluster           # §5.1 decade
#   tools/rehearse.sh 10 --skew -b target/rehearse/sf1 \
#       stream_sessionize ev_sessionize                   # §5.2 rows
set -uo pipefail
cd /root/repo

FACTOR="$1"; shift
FLAGS=()
PASSES=3
BASE=""
QS=()
while [ $# -gt 0 ]; do
  case "$1" in
    --skew|--firehose|--boilerplate) FLAGS+=("$1") ;;
    -p) shift; PASSES="$1" ;;
    -b) shift; BASE="$1" ;;
    *) QS+=("$1") ;;
  esac
  shift
done
[ ${#QS[@]} -gt 0 ] || { echo "no queries given" >&2; exit 2; }

NAME="sf$(python3 -c "print($FACTOR/10 if $FACTOR % 10 else $FACTOR//10)")"
for f in ${FLAGS[@]+"${FLAGS[@]}"}; do NAME="${NAME}_${f#--}"; done
DST="target/rehearse/$NAME"
if [ ! -f "$DST/orders.parquet" ]; then
  echo "# generating $DST (factor $FACTOR ${FLAGS[*]:-})" >&2
  python3 tools/make_sf.py /root/testdata/sf0.1 "$DST" "$FACTOR" \
    ${FLAGS[@]+"${FLAGS[@]}"} >&2
fi

echo "| query | ${BASE:+base s | }$NAME s |${BASE:+ ratio |} note |"
echo "|---|---|---|${BASE:+---|---|}"
for q in "${QS[@]}"; do
  line=$(SPARK_GRAFT_SF_DIR="$DST" timeout 3000 \
    tools/bench_one.sh "$q" "$PASSES" 2>/dev/null | tail -1)
  t=$(echo "$line" | sed -n 's/.*min=\([0-9.]*\).*/\1/p')
  [ -n "$t" ] || t="FAIL"
  if [ -n "$BASE" ]; then
    bline=$(SPARK_GRAFT_SF_DIR="$BASE" timeout 3000 \
      tools/bench_one.sh "$q" "$PASSES" 2>/dev/null | tail -1)
    bt=$(echo "$bline" | sed -n 's/.*min=\([0-9.]*\).*/\1/p')
    [ -n "$bt" ] || bt="FAIL"
    ratio=$(python3 -c "print(f'{$t/$bt:.2f}')" 2>/dev/null || echo "-")
    echo "| $q | $bt | $t | $ratio |  |"
  else
    echo "| $q | $t |  |"
  fi
done
