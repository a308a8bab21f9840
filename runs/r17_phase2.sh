#!/bin/bash
# Round-17 phase 2: deepen the fresh sf1 mins (2nd probe-gated run per
# side) — the min-combine protocol over THIS round's runs only.
set -uo pipefail
cd /root/repo
R=/root/repo/runs/r17
mkdir -p "$R/sf1_spark2"
CLS=/tmp/graft_classes_r17
AO="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="$CLS:/opt/spark/jars/*"

step() { echo "=== $1 $(date -u +%H:%M:%S)"; }

step "spark sf1 bench run 2"
( cd "$R/sf1_spark2" && \
  SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf1 SPARK_GRAFT_BENCH_EXTRA=1 \
  java $AO -Dspark.ui.enabled=false -Xmx8g -cp "$CP" graft.Bench \
    > bench_stdout.log 2> bench_stderr.log ) || exit 1

step "duck sf1 run 2"
python3 tools/bench_duck.py /root/repo/.bench/sf1 \
  /tmp/verify_r17/oracle_sql.json "$R/duck_sf1_run2.json" \
  2> "$R/duck_sf1_run2_stderr.log" || exit 1

step "DONE phase2"
