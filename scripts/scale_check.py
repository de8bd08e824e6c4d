#!/usr/bin/env python3
"""Scale-sweep ratchet (r13 verdict #4): compare a fresh 4x Bench run
against the per-entry floors in SCALE_FLOOR.json so scale regressions
fail LOUDLY instead of waiting for someone to re-run the full SCALE.md
sweep by hand.

Usage:
  python3 scripts/scale_check.py [4x.json] [--update] [--scale z4]

  4x.json    Bench output for the 4x corpus (default
             /root/repo/target/scale/results/4x.json — scale_bench.sh's
             output path, or run just the 4x row by hand:
             sbt "runMain graft.tools.ScaleCorpus /root/testdata/sf0.1 target/scale/x4 4"
             SPARK_GRAFT_SF_DIR=target/scale/x4 SPARK_GRAFT_RUNS=2 \
             SPARK_GRAFT_ONLY=<entries> sbt "runMain graft.Bench" > 4x.json)
  --update   lower floors where the new run beat them (never raises).
  --scale S  which ratchet to check the receipt against: "4x"
             (default, SCALE_FLOOR.json key "floors") or "z4" (key
             "floors_z4" — the Zipf-corpus query-join cohort, r14
             verdict #6; generate the corpus with
             sbt "runMain graft.tools.ScaleCorpus /root/testdata/sf0.1 target/scale/z4 4 zipf").

Exit 1 when any entry exceeds its floor by more than the noise margin
(1.5x — single-machine best-of-2 timings jitter; a genuine scale
regression like the r13 sort-spill was 10x+). New entries (no floor
yet) are reported and added with --update.
"""
import json, sys, os

MARGIN = 1.5
FLOOR_PATH = os.path.join(os.path.dirname(__file__), "..", "SCALE_FLOOR.json")

argv = sys.argv[1:]
scale = "4x"
if "--scale" in argv:
    i = argv.index("--scale")
    if i + 1 >= len(argv):
        print("FATAL: --scale needs a value (e.g. --scale z4)")
        sys.exit(2)
    scale = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
args = [a for a in argv if a != "--update"]
update = "--update" in argv
default_run = {"4x": "/root/repo/target/scale/results/4x.json",
               "z4": "/root/repo/target/scale/results/z4.json"}
run_path = args[0] if args else default_run.get(scale, default_run["4x"])
floor_key = "floors" if scale == "4x" else f"floors_{scale}"

with open(FLOOR_PATH) as f:
    floor_doc = json.load(f)
# a typoed --scale must not silently pass by treating every entry as
# "new" against an empty floor table (ADVICE r15): only --update may
# CREATE a floor table, and then says so loudly
if floor_key not in floor_doc:
    known = ", ".join(k for k in sorted(floor_doc) if k.startswith("floors"))
    if not update:
        print(f"FATAL: no '{floor_key}' table in SCALE_FLOOR.json "
              f"(known: {known}) — typoed --scale? Use --update to create it.")
        sys.exit(2)
    print(f"CREATING new floor table '{floor_key}' (known: {known})")
floors = floor_doc.setdefault(floor_key, {})

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
    floor_doc[floor_key] = floors
    with open(FLOOR_PATH, "w") as f:
        json.dump(floor_doc, f, indent=1, sort_keys=True)
    print(f"\nfloors updated ({FLOOR_PATH})")

# SCALE.md placeholder guard (r14 verdict #3: the round shipped
# literal EXACT_16X/ZIPF_TABLE tokens where numbers belonged — fail
# the ratchet whenever a placeholder survives into the write-up)
import re
scale_md = os.path.join(os.path.dirname(__file__), "..", "SCALE.md")
if os.path.exists(scale_md):
    body = open(scale_md).read()
    stale = sorted(set(re.findall(r"\b(?:[A-Z]+_\d+X|ZIPF_TABLE|TODO_[A-Z_]+)\b", body)))
    if stale:
        print(f"PLACEHOLDER tokens in SCALE.md: {', '.join(stale)}")
        fails += 1

print(f"\n{len(queries) - fails} ok, {fails} regressions, {news} new")
sys.exit(1 if fails else 0)
