#!/usr/bin/env python3
"""Min-combine sf1 bench pairs into the committed artifacts.

Usage:
  python3 tools/combine_pairs.py [--prefix sfN] <note> spark_run.json [spark_run...] -- duck_run.json [duck_run...]

--prefix sf10 writes bench_sf10_out.json / duck_sf10_out.json instead
of the sf1 artifact names (the sf10 pair must not clobber the sf1 one).

Each spark_run.json is a graft.Bench output (probe-gated, contains
"passes": [{query: sec}, ...]); each duck_run.json a tools/bench_duck.py
output ({"total": s, "queries": {query: sec}}). Takes the per-query MIN
across every pass of every run (the established min-combine protocol:
both engines keep their best clean pass per query, so host-contention
noise can only hurt, never flatter, either side), restricts DuckDB to
the Spark headline set, and writes bench_sf1_out.json /
duck_sf1_out.json plus a ratio table for queries where DuckDB does
>= 0.3 s of work.
"""
import json
import sys

# THE BAND POLICY, stated once (round-12: the threshold had crept
# 0.4 -> 0.6 s across rounds with no recorded decision).  A query is
# on WATCH when Spark reads > WATCH_RATIO x DuckDB on a side where
# DuckDB does >= WATCH_MIN_DUCK_S of real work; the builder's weak
# bar applies to the >= WEAK_MIN_DUCK_S band.  Watch rows ship in
# bench_sf1_out.json so every round's artifact carries the list.
WATCH_RATIO = 2.0
WATCH_MIN_DUCK_S = 0.4
WEAK_MIN_DUCK_S = 0.6


def main():
    argv = list(sys.argv[1:])
    prefix = "sf1"
    if argv and argv[0] == "--prefix":
        prefix = argv[1]
        argv = argv[2:]
    note = argv[0]
    split = argv.index("--")
    spark_files, duck_files = argv[1:split], argv[split + 1:]

    smin = {}
    for f in spark_files:
        # graft.Bench emits two JSON LINES (passes line, then headline);
        # take every pass dict found on any line
        for line in open(f):
            j = json.loads(line)
            for p in j.get("passes", []):
                if isinstance(p, dict):
                    for q, t in p.items():
                        smin[q] = min(smin.get(q, 1e9), t)
            # a previously COMBINED artifact carries its mins in the
            # headline "queries" dict (each value was itself a min of
            # real passes) — accept it as one pass so re-combining
            # against the committed pair keeps the established floors
            if j.get("metric") == "total" and isinstance(j.get("queries"), dict):
                for q, t in j["queries"].items():
                    smin[q] = min(smin.get(q, 1e9), t)

    dmin = {}
    for f in duck_files:
        j = json.load(open(f))
        for q, t in j["queries"].items():
            # bench_duck records an errored/DNF query as -1 (e.g. the
            # sf10 q37 mirror exhausting 75 GB of spill): that is a
            # MISSING timing, not a 0-second one — min-combining it
            # would hand the query a fake duck side
            if q in smin and t >= 0:
                dmin[q] = min(dmin.get(q, 1e9), t)

    missing = sorted(set(smin) - set(dmin))
    if missing:
        print(f"WARNING: no duck timing for {missing}", file=sys.stderr)

    stot = round(sum(smin.values()), 3)
    dtot = round(sum(dmin.values()), 3)
    # the headline RATIO must compare the same query set on both
    # sides: when the sets diverge (a query timed on one side only),
    # stot/dtot above would drift silently while the per-query table
    # looks consistent — compute the printed ratio over the
    # intersection and carry it in the artifact
    common = sorted(set(smin) & set(dmin))
    cstot = round(sum(smin[q] for q in common), 3)
    cdtot = round(sum(dmin[q] for q in common), 3)
    # guard q in smin: dmin is built restricted to smin today, but if
    # the sets ever diverge (a query skipped on one side only) the
    # watch computation must degrade to the intersection, not KeyError
    # and lose the round's artifact
    watch = sorted(
        q for q in dmin if q in smin
        and dmin[q] >= WATCH_MIN_DUCK_S and smin[q] > WATCH_RATIO * dmin[q])
    with open(f"bench_{prefix}_out.json", "w") as f:
        f.write(json.dumps({"metric": "passes", "note": note}) + "\n")
        f.write(json.dumps({"metric": "total", "value": stot, "unit": "sec",
                            "queries": {q: round(t, 3) for q, t in sorted(smin.items())},
                            "common": {"n": len(common), "spark_s": cstot,
                                       "duck_s": cdtot},
                            "watch": watch,
                            "band": {"watch_ratio": WATCH_RATIO,
                                     "watch_min_duck_s": WATCH_MIN_DUCK_S,
                                     "weak_min_duck_s": WEAK_MIN_DUCK_S}}) + "\n")
    with open(f"duck_{prefix}_out.json", "w") as f:
        f.write(json.dumps({"total": dtot,
                            "queries": {q: round(t, 3) for q, t in sorted(dmin.items())}}) + "\n")

    print(f"Spark {cstot:.1f} s vs DuckDB {cdtot:.1f} s -> {cstot/cdtot:.2f}x "
          f"over {len(common)} common queries"
          + ("" if len(common) == len(smin) else
             f" (Spark-only extra: {round(stot-cstot,3)} s over {len(smin)-len(common)} queries)"))
    print("\n| query | Spark s | DuckDB s | ratio |")
    print("| --- | --- | --- | --- |")
    for q in sorted(dmin, key=lambda q: -dmin[q]):
        if q in smin and dmin[q] >= 0.3:
            print(f"| {q} | {smin[q]:.2f} | {dmin[q]:.2f} | {smin[q]/dmin[q]:.2f} |")
    print(f"\nWATCH (> {WATCH_RATIO}x with DuckDB >= {WATCH_MIN_DUCK_S} s): "
          + (", ".join(watch) if watch else "EMPTY"))


if __name__ == "__main__":
    main()
