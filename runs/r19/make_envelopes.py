#!/usr/bin/env python3
"""Round-19 envelope rebase (VERDICT r18 task 9).

Rule: FULL REBASE to floors measured on the shipped round-19 code
(the round-14 precedent — the host base shifted ~1.4x vs the rounds
the old lines were measured on, and stale-fast lines over-flag while
stale-slow lines under-gate improved operators like q79 62s->27s).
Per-query floor = min over the fresh probe-gated runs listed below
(all 2/2 clean passes, probes healthy), plus any fresh ISOLATED
re-measurement (the guard's own rescue protocol) where the suite
number is a known in-suite artifact (q93 at sf10: 9.2 in-suite vs
4.26 isolated — 24g-suite neighbor effect, reproducibly absent
isolated).
"""
import json, sys

def load(path):
    for l in open(path):
        j = json.loads(l)
        if j.get("metric") == "total":
            return j["queries"]
    raise SystemExit(f"no total line in {path}")

def write_env(path, floors, header):
    lines = [header.rstrip(), ""]
    for q in sorted(floors):
        lines.append(f"{q}={floors[q]:.2f}")
    open(path, "w").write("\n".join(lines) + "\n")
    print(f"wrote {path}: {len(floors)} lines")

sf1a = load("runs/r19/sf1_spark/bench_out.json")
sf1b = load("runs/r19/sf1_spark2/bench_out.json")
sf1 = {q: min(sf1a[q], sf1b[q]) for q in sf1a if q in sf1b}

sf10 = load("runs/r19/sf10_spark/bench_out.json")
# NOTE: every line is the IN-SUITE min — one consistent protocol.
# q93's in-suite 9.20 s is a reproducible 24g-suite neighbor effect
# (fresh-JVM isolated BENCH_ONLY reads 4.26 s); keeping the in-suite
# floor means a routine guard run (same protocol) doesn't trigger the
# isolated-rescue loop every time, while a real q93 regression still
# fails at >2x of the in-suite number.

write_env("bench_envelope_sf1.conf", sf1, """\
# sf1 per-query envelope (seconds). BenchGuardSpec fails a query at
# >2x its line. Refresh with each round's final sf1 pair.
#
# ROUND-19 FULL REBASE (the round-14 rule): floors = per-query min
# over the TWO fresh probe-gated graft.Bench runs at sf1 on the
# shipped round-19 code (runs/r19/sf1_spark{,2}/bench_out.json, both
# 2/2 clean passes, probes 0.58-0.66 s single / 0.67-0.79 s all-core).
# Rebase reason: the host base shifted ~1.4x median vs the old lines
# (q15/q21 read 2.1-2.2x on a trivial filter — the rotating-small-
# query false-flag mode round 14 documented), while improved
# operators' old lines under-gated (q79's old floor was 2.3x the
# fresh number). Data: .bench/sf1 regenerated this round by GenSf
# from the 2026-08-17 sf0.1 drop (deterministic).""")

write_env("bench_envelope_sf10.conf", sf10, """\
# sf10 per-query envelope (seconds). BenchGuardSpec fails a query at
# >2x its line; canonical run config SPARK_DRIVER_MEM=24g (Xmx24g),
# local[32], shuffle partitions 32 (GraftSession defaults).
#
# ROUND-19 FULL REBASE (the round-14 rule): floors = the fresh
# probe-gated graft.Bench run at sf10 on the shipped round-19 code
# (runs/r19/sf10_spark/bench_out.json, 2/2 clean passes, probes
# 0.63-0.66 s single / 0.73-0.79 s all-core) — every line the
# IN-SUITE min, one consistent protocol. q93's 9.20 s is a
# reproducible 24g-suite neighbor effect (fresh-JVM isolated
# BENCH_ONLY reads 4.26 s); the in-suite floor keeps routine guard
# runs rescue-free while a real regression still fails at >2x.
# Rebase reason as in the sf1 conf; improved operators this
# round read far under their old lines (q79 62.1->26.9, q84
# 17.9->9.3, q92 20.9->14.5). Data: .bench/sf10 regenerated this
# round by GenSf (deterministic).""")
