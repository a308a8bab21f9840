#!/bin/bash
# Round-17 phase 2 (sequential, idle host):
#   1. spark sf1 bench run 2 + duck sf1 run 2   (min depth, fresh-only protocol)
#   2. spark sf10 bench run 2
#   3. duck sf10 targeted re-run of the 14 dirty rows (clean windows)
#   4. ProfileFusedAB at sf1 and sf10            (q15/q56 A/B)
#   5. BenchGuard sf1 + sf10 gates (opt-in envelopes) via sbt
set -uo pipefail
cd /root/repo
R=/root/repo/runs/r17
mkdir -p "$R/sf1_spark2" "$R/sf10_spark2"
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

step "spark sf10 bench run 2"
SF10_ONLY=$(python3 -c "
import json
for l in open('bench_sf10_out.json'):
    j = json.loads(l)
    if 'queries' in j:
        print(','.join(sorted(j['queries']))); break")
( cd "$R/sf10_spark2" && \
  SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf10 SPARK_GRAFT_BENCH_ONLY="$SF10_ONLY" \
  java $AO -Dspark.ui.enabled=false -Xmx24g -cp "$CP" graft.Bench \
    > bench_stdout.log 2> bench_stderr.log ) || exit 1

step "duck sf10 dirty-row re-run"
python3 tools/bench_duck.py /root/repo/.bench/sf10 \
  "$R/oracle_dirty_sf10.json" "$R/duck_sf10_rerun.json" \
  2> "$R/duck_sf10_rerun_stderr.log" || exit 1

step "ProfileFusedAB sf1"
sbt -batch "Test/runMain graft.ProfileFusedAB /root/repo/.bench/sf1" \
  > "$R/fused_ab_sf1.log" 2>&1 || exit 1

step "ProfileFusedAB sf10"
sbt -batch "Test/runMain graft.ProfileFusedAB /root/repo/.bench/sf10" \
  > "$R/fused_ab_sf10.log" 2>&1 || exit 1

step "BenchGuard sf1 + sf10"
GRAFT_BENCH_GUARD=1 GRAFT_BENCH_GUARD_SF10=1 \
  sbt -batch "Test/testOnly graft.BenchGuardSpec" \
  > "$R/benchguard.log" 2>&1 || echo "BENCHGUARD NONZERO RC (see log)"

step "DONE phase2"
