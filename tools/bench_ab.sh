#!/bin/bash
# Interleaved A/B bench: alternate two class snapshots on the SAME
# host back-to-back, so per-pair ratios cancel host drift — the
# decisive check that a cross-round bench inflation is environmental,
# not a binary regression.
#
# usage: tools/bench_ab.sh <pairs> [tagA tagB]
#   Each tag names a prebuilt snapshot target/bench_cls_<tag>
#   (e.g. `git stash`-free: check out the old round, sbt compile,
#   `cp -a target/scala-2.13/classes target/bench_cls_r16`, return).
#   Defaults to r15 r16 (the round-16 experiment's tags).
set -u
cd /root/repo
PAIRS=${1:?pairs}
TAG_A=${2:-r15}
TAG_B=${3:-r16}
# fail fast on a missing snapshot: with only `set -u` a bad -cp makes
# every java call fail silently and each pair still prints a "done"
# line from the error log's tail
for t in "$TAG_A" "$TAG_B"; do
  if [ ! -d "target/bench_cls_${t}/graft" ]; then
    echo "ERROR: snapshot target/bench_cls_${t} missing or not a" \
      "class tree — build it first (see usage)" >&2
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
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=target/bench_ab_${1}_p${2}.json \
  java $ADDOPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/bench_cls_${1}:/opt/spark/jars/*" graft.Bench \
    > target/bench_ab_${1}_p${2}.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "pair $2 $1: FAILED rc=$rc (see target/bench_ab_${1}_p${2}.log)" >&2
    exit $rc
  fi
  echo "pair $2 $1: $(tail -1 target/bench_ab_${1}_p${2}.log)"
}
i=1
while [ "$i" -le "$PAIRS" ]; do
  run_one "$TAG_A" "$i"
  run_one "$TAG_B" "$i"
  i=$((i + 1))
done
