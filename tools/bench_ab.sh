#!/bin/bash
# Interleaved A/B bench: alternate the r15 and r16 class snapshots on
# the SAME host back-to-back, so per-pair ratios cancel host drift —
# the decisive check that a cross-round bench inflation is
# environmental, not a binary regression.
#
# usage: tools/bench_ab.sh <pairs>
set -u
cd /root/repo
PAIRS=${1:?pairs}
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() { # $1 = binary tag (r15|r16), $2 = pair idx
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=target/bench_ab_${1}_p${2}.json \
  java $ADDOPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/bench_cls_${1}:/opt/spark/jars/*" graft.Bench \
    > target/bench_ab_${1}_p${2}.log 2>&1
  echo "pair $2 $1: $(tail -1 target/bench_ab_${1}_p${2}.log)"
}
i=1
while [ "$i" -le "$PAIRS" ]; do
  run_one r15 "$i"
  run_one r16 "$i"
  i=$((i + 1))
done
