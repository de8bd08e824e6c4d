#!/usr/bin/env python3
"""Scale-sweep ratchet (r13 verdict #4): compare a fresh 4x Bench run
against the per-entry floors in SCALE_FLOOR.json so scale regressions
fail LOUDLY instead of waiting for someone to re-run the full SCALE.md
sweep by hand.

Usage:
  python3 scripts/scale_check.py [4x.json] [--update]

  4x.json    Bench output for the 4x corpus (default
             /root/repo/target/scale/results/4x.json — scale_bench.sh's
             output path, or run just the 4x row by hand:
             sbt "runMain graft.tools.ScaleCorpus /root/testdata/sf0.1 target/scale/x4 4"
             SPARK_GRAFT_SF_DIR=target/scale/x4 SPARK_GRAFT_RUNS=2 \
             SPARK_GRAFT_ONLY=<entries> sbt "runMain graft.Bench" > 4x.json)
  --update   lower floors where the new run beat them (never raises).

Exit 1 when any entry exceeds its floor by more than the noise margin
(1.5x — single-machine best-of-2 timings jitter; a genuine scale
regression like the r13 sort-spill was 10x+). New entries (no floor
yet) are reported and added with --update.
"""
import json, sys, os

MARGIN = 1.5
FLOOR_PATH = os.path.join(os.path.dirname(__file__), "..", "SCALE_FLOOR.json")

args = [a for a in sys.argv[1:] if a != "--update"]
update = "--update" in sys.argv
run_path = args[0] if args else "/root/repo/target/scale/results/4x.json"

with open(FLOOR_PATH) as f:
    floor_doc = json.load(f)
floors = floor_doc["floors"]

line = open(run_path).read().strip().splitlines()[-1]
queries = json.loads(line).get("queries", {})
if not queries:
    print(f"FATAL: no queries in {run_path}")
    sys.exit(1)

fails, news = 0, 0
for name, sec in sorted(queries.items()):
    floor = floors.get(name)
    if floor is None:
        print(f"NEW     {name}: {sec:.2f}s (no floor yet)")
        news += 1
        if update:
            floors[name] = round(sec, 3)
        continue
    ratio = sec / floor if floor > 0 else 1.0
    if ratio > MARGIN:
        print(f"REGRESS {name}: {sec:.2f}s vs floor {floor:.2f}s ({ratio:.2f}x)")
        fails += 1
    else:
        tag = "OK     "
        if sec < floor:
            tag = "FASTER "
            if update:
                floors[name] = round(sec, 3)
        print(f"{tag} {name}: {sec:.2f}s vs floor {floor:.2f}s ({ratio:.2f}x)")

if update:
    floor_doc["floors"] = floors
    with open(FLOOR_PATH, "w") as f:
        json.dump(floor_doc, f, indent=1, sort_keys=True)
    print(f"\nfloors updated ({FLOOR_PATH})")

print(f"\n{len(queries) - fails} ok, {fails} regressions, {news} new")
sys.exit(1 if fails else 0)
