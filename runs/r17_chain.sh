#!/bin/bash
# Round-17 clean-host verification pair (VERDICT r16 task #1).
# Runs OUTSIDE sbt (snapshotted classes + /opt/spark/jars) so the sbt
# dev loop stays free while this chain works through:
#   gen sf1 -> gen sf10 -> oracle dump -> spark sf1 -> duck sf1
#   -> spark sf10 -> duck sf10
# Artifacts land under runs/r17/.
set -uo pipefail
cd /root/repo
R=/root/repo/runs/r17
mkdir -p "$R/sf1_spark" "$R/sf10_spark"
CLS=/tmp/graft_classes_r17
rm -rf "$CLS" && cp -r target/scala-2.13/classes "$CLS"

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

step "gen sf1"
[ -d .bench/sf1/lineitem.parquet ] || \
  java $AO -Dspark.ui.enabled=false -Xmx8g -cp "$CP" \
    graft.GenSf /root/testdata/sf0.1 /root/repo/.bench/sf1 10 || exit 1

step "gen sf10"
[ -d .bench/sf10/lineitem.parquet ] || \
  java $AO -Dspark.ui.enabled=false -Xmx24g -cp "$CP" \
    graft.GenSf /root/testdata/sf0.1 /root/repo/.bench/sf10 100 || exit 1

step "oracle dump (Verify at sf0.001)"
[ -f /tmp/verify_r17/oracle_sql.json ] || \
  java $AO -Dspark.ui.enabled=false -Xmx8g -cp "$CP" \
    graft.Verify /root/testdata/sf0.001 /tmp/verify_r17 || exit 1

step "spark sf1 bench (headline+extra)"
( cd "$R/sf1_spark" && \
  SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf1 SPARK_GRAFT_BENCH_EXTRA=1 \
  java $AO -Dspark.ui.enabled=false -Xmx8g -cp "$CP" graft.Bench \
    > bench_stdout.log 2> bench_stderr.log ) || exit 1

step "duck sf1"
python3 tools/bench_duck.py /root/repo/.bench/sf1 \
  /tmp/verify_r17/oracle_sql.json "$R/duck_sf1.json" \
  2> "$R/duck_sf1_stderr.log" || exit 1

step "spark sf10 bench (sf10 headline set)"
# the sf10 set = headline+extra minus the nine slice/recursive mirrors
# that carry standalone envelope floors instead (BENCH_SF10.md policy)
SF10_ONLY=$(python3 - <<'EOF'
import json
for l in open("bench_sf10_out.json"):
    j = json.loads(l)
    if "queries" in j:
        print(",".join(sorted(j["queries"]))); break
EOF
)
( cd "$R/sf10_spark" && \
  SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf10 SPARK_GRAFT_BENCH_ONLY="$SF10_ONLY" \
  SPARK_DRIVER_MEM=24g \
  java $AO -Dspark.ui.enabled=false -Xmx24g -cp "$CP" graft.Bench \
    > bench_stdout.log 2> bench_stderr.log ) || exit 1

step "duck sf10 (with OOM-kill resume)"
for attempt in 1 2 3 4; do
  python3 tools/bench_duck.py /root/repo/.bench/sf10 \
    /tmp/verify_r17/oracle_sql.json "$R/duck_sf10.json" --resume \
    2>> "$R/duck_sf10_stderr.log" && break
  echo "duck sf10 attempt $attempt died (rc=$?) — resuming"
done

step "DONE"
