#!/bin/bash
# Round-18 task #4: clean DuckDB windows for the three dirty-flagged
# rows (VERDICT r17 "What's wrong" #4) — q15/q20 at sf1, q02 at sf10 —
# then re-min-combine clean-wins so `duck_dirty` empties at both
# scales. Run on an idle host (bench_duck.py's own probes gate each
# timed window; a still-dirty window re-flags and we retry later).
set -uo pipefail
cd /root/repo
R=/root/repo/runs/r18
mkdir -p "$R"

python3 - <<'EOF'
import json
sql = json.load(open('/tmp/verify_r17/oracle_sql.json'))
json.dump({k: sql[k] for k in ('q15_author_filter', 'q20_words_between_cmds')},
          open('/tmp/oracle_dirty_sf1.json', 'w'))
json.dump({k: sql[k] for k in ('q02_top_revenue',)},
          open('/tmp/oracle_dirty_sf10.json', 'w'))
EOF

step() { echo "=== $1 $(date -u +%H:%M:%S)"; }

step "duck sf1 targeted (q15, q20)"
python3 tools/bench_duck.py /root/repo/.bench/sf1 \
  /tmp/oracle_dirty_sf1.json "$R/duck_sf1_clean.json" \
  2> "$R/duck_sf1_clean_stderr.log"

step "duck sf10 targeted (q02)"
python3 tools/bench_duck.py /root/repo/.bench/sf10 \
  /tmp/oracle_dirty_sf10.json "$R/duck_sf10_clean.json" \
  2> "$R/duck_sf10_clean_stderr.log"

step "re-combine clean-wins"
# the committed pair re-enters as one (already-min-combined) pass per
# side; the targeted runs contribute their clean windows — clean wins
# over dirty per combine_pairs' policy, so duck_dirty empties iff the
# new windows were probe-clean
python3 tools/combine_pairs.py \
  "round-18 re-combine: round-17 fresh pair + targeted clean duck windows for the dirty-flagged rows" \
  bench_sf1_out.json -- duck_sf1_out.json "$R/duck_sf1_clean.json" \
  > "$R/combine_sf1.log" 2>&1
python3 tools/combine_pairs.py --prefix sf10 \
  "round-18 re-combine: round-17 fresh pair + targeted clean duck window for q02" \
  bench_sf10_out.json -- duck_sf10_out.json "$R/duck_sf10_clean.json" \
  > "$R/combine_sf10.log" 2>&1
grep -h 'duck_dirty\|WARNING' "$R/combine_sf1.log" "$R/combine_sf10.log" || true
python3 - <<'EOF'
import json
for f in ['bench_sf1_out.json', 'bench_sf10_out.json']:
    for l in open(f).read().strip().split('\n'):
        d = json.loads(l)
        if 'duck_dirty' in d:
            print(f, 'duck_dirty =', d['duck_dirty'])
EOF
step "DONE r18 duckclean"
