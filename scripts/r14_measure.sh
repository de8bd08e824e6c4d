#!/bin/bash
# Round-14 measurement batch (run once, receipts into scale_results/):
#  (a) 16x exact vs capped vs impact-pruned expand join (the headline)
#  (b) Zipf-mode corpora + query-join cohort at z1/z4/z16 (verdict #2)
#  (c) 64x heap-control re-run at 16g for the entries whose last step
#      ratio exceeded ~4 (verdict #3)
set -u
cd /root/repo
OUT=scale_results
mkdir -p "$OUT" target/scale/results

echo "=== (a) capped/pruned expand at 16x"
sbt -batch "runMain graft.tools.CappedExpandBench target/scale/x16 64" \
  2>"$OUT/r14_capped16.err" | grep -F '"metric"' | tail -1 \
  > "$OUT/capped_expand_16x_r14.json"
cat "$OUT/capped_expand_16x_r14.json"

echo "=== (b) zipf corpora"
for f in 1:z1 4:z4 16:z16; do
  mult="${f%%:*}"; name="${f##*:}"
  if [ ! -d "target/scale/$name" ]; then
    sbt -batch "runMain graft.tools.ScaleCorpus /root/testdata/sf0.1 target/scale/$name $mult zipf" \
      2>>"$OUT/r14_zipf.err" | tail -1
  fi
done

ZQ="query_join_ast,query_join_bool,query_join_ast_expand,query_join_ast_pruned,query_join_ast_expand_pruned,query_join_ast_capped"
for name in z1 z4 z16; do
  echo "=== (b) zipf bench $name"
  SPARK_GRAFT_SF_DIR="target/scale/$name" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS=2 SPARK_GRAFT_ONLY="$ZQ" \
    sbt -batch "runMain graft.Bench" 2>"$OUT/r14_$name.err" \
    | grep -F '"metric"' | tail -1 > "$OUT/$name.json"
  tail -c 400 "$OUT/$name.json"; echo
done

echo "=== (c) 64x heap control at 16g"
HC="pii_scrub_live,query_join_bool,query_join_ast,stream_ingest_e2e,search_dsv2_write"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=target/scale/x64 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_RUNS=1 SPARK_GRAFT_ONLY="$HC" \
  sbt -batch "runMain graft.Bench" 2>"$OUT/r14_64x16g.err" \
  | grep -F '"metric"' | tail -1 > "$OUT/64x_16g.json"
cat "$OUT/64x_16g.json"
echo "=== done"
