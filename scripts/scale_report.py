#!/usr/bin/env python3
"""Render the scaling-curve table for SCALE.md from scale_bench.sh output.

Reads target/scale/results/{1x,4x,16x,64x}.json (one Bench JSON line
each) and prints a markdown table: per-entry best-of-2 seconds at each
scale plus the step ratios (4x/1x, 16x/4x, 64x/16x). A step ratio of
4.0 is perfectly linear in corpus size; below is sublinear (fixed
overheads amortizing); above flags superlinearity to investigate.
"""
import json, os, sys

RESULTS = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/scale/results"
SCALES = ["1x", "4x", "16x", "64x"]


def load(scale):
    path = os.path.join(RESULTS, f"{scale}.json")
    if not os.path.exists(path):
        return {}
    line = open(path).read().strip()
    if not line:
        return {}
    d = json.loads(line)
    return {k: v for k, v in d.get("queries", {}).items()}


def main():
    data = {s: load(s) for s in SCALES}
    entries = sorted(set().union(*[d.keys() for d in data.values()]))
    # order by 64x (or largest available) time, descending
    def keytime(e):
        for s in reversed(SCALES):
            if e in data[s] and data[s][e] >= 0:
                return -data[s][e]
        return 0.0
    entries.sort(key=keytime)
    hdr = ["entry"] + SCALES + ["r(4/1)", "r(16/4)", "r(64/16)"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for e in entries:
        ts = [data[s].get(e) for s in SCALES]
        def fmt(v):
            return "—" if v is None else ("ERR" if v < 0 else f"{v:.2f}")
        ratios = []
        for a, b in zip(ts, ts[1:]):
            ratios.append(
                f"{b/a:.2f}" if a and b and a > 0 and b > 0 else "—")
        print("| " + " | ".join([e] + [fmt(t) for t in ts] + ratios) + " |")
    # totals
    for s in SCALES:
        vs = [v for v in data[s].values() if v is not None and v >= 0]
        if vs:
            print(f"\n- {s}: {len(vs)} entries, sum {sum(vs):.1f}s")
    # cold-build table (IndexBuildBench output)
    builds = {}
    for s in SCALES:
        p = os.path.join(RESULTS, f"{s}_build.json")
        if os.path.exists(p) and open(p).read().strip():
            builds[s] = json.loads(open(p).read())
    if builds:
        print("\n| build | " + " | ".join(builds) + " |")
        print("|---|" + "---|" * len(builds))
        for kcol, label in [("search_build_sec", "search index (cold)"),
                            ("search_warm_probe_sec", "search probe (warm)"),
                            ("ivfpq_build_sec", "IVF-PQ train+encode (cold)"),
                            ("ivfpq_warm_probe_sec", "IVF-PQ probe (warm)"),
                            ("n_docs", "docs"), ("n_vecs", "vectors")]:
            print(f"| {label} | " +
                  " | ".join(str(builds[s].get(kcol, "—")) for s in builds) + " |")


if __name__ == "__main__":
    main()
