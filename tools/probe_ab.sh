#!/bin/bash
# Interleaved A/B *probe*: the bench_ab.sh pattern applied to
# graft.Probe rows — alternate two prebuilt class snapshots on the
# SAME host back-to-back, running only the named probe queries, so
# per-pair ratios cancel host drift. This is the "isolated two-binary
# A/B on a suspicious probe row" protocol the verify skill prescribes
# (never argue from cross-day probe numbers).
#
# usage: tools/probe_ab.sh <pairs> <tagA> <tagB> <query> [query ...]
#   Tags name prebuilt snapshots target/bench_cls_<tag> (see
#   bench_ab.sh for the build recipe). Probe data dir comes from
#   SPARK_GRAFT_SF_DIR (default /tmp/sfbig2).
set -u
cd /root/repo
PAIRS=${1:?pairs}
TAG_A=${2:?tagA}
TAG_B=${3:?tagB}
shift 3
QUERIES="$*"
[ -n "$QUERIES" ] || { echo "ERROR: no probe queries named" >&2; exit 1; }
for t in "$TAG_A" "$TAG_B"; do
  if [ ! -d "target/bench_cls_${t}/graft" ]; then
    echo "ERROR: snapshot target/bench_cls_${t} missing or not a" \
      "class tree — build it first (see bench_ab.sh)" >&2
    exit 1
  fi
done
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() { # $1 = binary tag, $2 = pair idx
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/tmp/sfbig2} \
  SPARK_GRAFT_CPUS=32 \
  java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-16g} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/bench_cls_${1}:/opt/spark/jars/*" graft.Probe $QUERIES \
    > target/probe_ab_${1}_p${2}.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "pair $2 $1: FAILED rc=$rc (see target/probe_ab_${1}_p${2}.log)" >&2
    exit $rc
  fi
  echo "pair $2 $1: $(grep '"query"' target/probe_ab_${1}_p${2}.log | tr '\n' ' ')"
}
i=1
while [ "$i" -le "$PAIRS" ]; do
  run_one "$TAG_A" "$i"
  run_one "$TAG_B" "$i"
  i=$((i + 1))
done
