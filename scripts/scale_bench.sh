#!/bin/bash
# Scaling-curve measurement (r12 verdict lead item): run the top-floor
# bench entries at 1x (sf0.1), 4x, 16x, 64x synthesized corpora and
# capture per-entry best-of-2 timings. Subset runs never write
# BENCH_FULL history (Bench guards that), so this cannot poison the
# driver's revisit thresholds.
set -u
ONLY=$(paste -sd, /tmp/entries.txt)
OUT=${1:-/root/repo/target/scale/results}
mkdir -p "$OUT"
for sc in "1x:/root/testdata/sf0.1" "4x:/root/repo/target/scale/x4" "16x:/root/repo/target/scale/x16" "64x:/root/repo/target/scale/x64"; do
  name=${sc%%:*}; dir=${sc#*:}
  echo "=== $name ($dir)"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=2 \
    SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Bench" 2>"$OUT/$name.err" | grep -F '"metric"' > "$OUT/$name.json"
  tail -c 300 "$OUT/$name.json"; echo
done
