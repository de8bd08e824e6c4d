#!/usr/bin/env python3
"""Summarize a Spark event log: jobs (duration, description) and the
slowest stages (duration, task count, shuffle read/write, name).

Usage: python3 scripts/evlog_summary.py /tmp/ev/<app-id> [--stages N]

Written for bench profiling: run ONE entry per Bench invocation with
  sbt -J-Dspark.eventLog.enabled=true -J-Dspark.eventLog.dir=/tmp/ev \
      "runMain graft.Bench"   (plus SPARK_GRAFT_ONLY=<entry>)
and feed the resulting file here to see where the entry's time goes.
"""
import json, sys, collections

path = sys.argv[1]
top_n = 25
if "--stages" in sys.argv:
    top_n = int(sys.argv[sys.argv.index("--stages") + 1])

jobs = {}          # jobId -> dict
stages = {}        # stageId -> dict
stage_metrics = collections.defaultdict(lambda: dict(sr=0, sw=0, inp=0, spill=0))

with open(path) as f:
    for line in f:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = dict(
                start=ev["Submission Time"],
                desc=ev.get("Properties", {}).get("spark.job.description", ""),
                stages=[s["Stage ID"] for s in ev.get("Stage Infos", [])])
        elif t == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stages[sid] = dict(
                name=si["Stage Name"],
                tasks=si["Number of Tasks"],
                start=si.get("Submission Time", 0),
                end=si.get("Completion Time", 0))
        elif t == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            sm = stage_metrics[sid]
            sm["sr"] += (m.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) \
                      + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            sm["sw"] += (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
            sm["inp"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
            sm["spill"] += m.get("Disk Bytes Spilled", 0)

print(f"== jobs: {len(jobs)}  stages: {len(stages)}")
tot = 0.0
for jid in sorted(jobs):
    j = jobs[jid]
    if "end" not in j:
        continue
    dur = (j["end"] - j["start"]) / 1000.0
    tot += dur
    if dur >= 0.05:
        print(f"job {jid:4d} {dur:8.2f}s  {j['desc'][:100]}")
print(f"== sum of job durations: {tot:.2f}s")
print(f"\n== slowest {top_n} stages:")
rows = []
for sid, s in stages.items():
    dur = (s["end"] - s["start"]) / 1000.0 if s["end"] else 0.0
    m = stage_metrics[sid]
    rows.append((dur, sid, s["tasks"], m, s["name"]))
rows.sort(reverse=True)
for dur, sid, tasks, m, name in rows[:top_n]:
    print(f"stage {sid:5d} {dur:7.2f}s tasks={tasks:4d} "
          f"sr={m['sr']/1e6:8.1f}MB sw={m['sw']/1e6:8.1f}MB "
          f"in={m['inp']/1e6:8.1f}MB spill={m['spill']/1e6:6.1f}MB  {name[:90]}")
