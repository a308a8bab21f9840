#!/bin/bash
# Round-18 task #2: land the green sf10 BenchGuard log (the artifact
# gap is three rounds old — VERDICT r17). Operational notes from the
# judge's two failed attempts are baked in:
#   - clear stale Spark litter from /tmp first (a 36 GB orphaned
#     blockmgr dir killed the first judge attempt mid-spill),
#   - SPARK_DRIVER_MEM=24g (the 8g default heap-OOMs the sf10 guard),
#   - run EARLY in the round on an idle host, retry across windows.
# Every log is scrubbed (runs/scrub_log.sh) before it lands under
# runs/ — the round-17 LEAKCHECK fix.
set -uo pipefail
cd /root/repo
R=/root/repo/runs/r18
mkdir -p "$R"

step() { echo "=== $1 $(date -u +%H:%M:%S)"; }

step "tmp hygiene"
# stale Spark/test litter only — never the live session's dirs
find /tmp -maxdepth 1 \( -name 'blockmgr-*' -o -name 'spark-*' \
  -o -name 'graft_*' -o -name 'firehose*' -o -name 'dbg_*' \
  -o -name 'ckpt*' -o -name 'hive*' \) -mmin +60 \
  -exec rm -rf {} + 2>/dev/null
df -h /tmp | tail -1

step "BenchGuard sf10 (24g, probe-gated)"
GRAFT_BENCH_GUARD_SF10=1 SPARK_DRIVER_MEM=24g \
  sbt -batch "Test/testOnly graft.BenchGuardSpec" \
  > "$R/benchguard_sf10.log" 2>&1
rc=$?
bash runs/scrub_log.sh "$R/benchguard_sf10.log"
echo "guard rc=$rc"
tail -15 "$R/benchguard_sf10.log"

step "DONE r18 guard"
