#!/bin/bash
# Scaling-curve measurement (r12 verdict lead item): synthesize 4x and
# 16x corpora from sf0.1 into /tmp/graft_scale (testdata is read-only)
# and run the top-floor entries at 1x/4x/16x with identical settings.
# Output: /tmp/graft_scale/bench_<tag>.json (one Bench JSON line each).
set -e
cd /root/repo

ENTRIES="link_pagerank_pages,link_pagerank_pages_converged,link_pagerank_pages_personalized,link_hits_pages,link_hits,stream_ingest_e2e,stream_cms_estimate,stream_dedup_vs_corpus,stream_simhash_pairs,query_join_ast,query_join_ast_expand,query_join_ast_xfield,query_join_bool,dedup_minhash,dedup_ngram,dedup_substring,cms_counts,ann_ivfpq,ann_ivfpq_reloaded"

CPUS="${SPARK_GRAFT_CPUS:-8}"
RUNS="${SPARK_GRAFT_RUNS:-1}"
SCALE_DIR=/tmp/graft_scale
mkdir -p "$SCALE_DIR"

if [ ! -f "$SCALE_DIR/x4/documents.parquet" ]; then
  sbt -batch "runMain graft.tools.ScaleCorpus /root/testdata/sf0.1 $SCALE_DIR/x4 4"
fi
if [ ! -f "$SCALE_DIR/x16/documents.parquet" ]; then
  sbt -batch "runMain graft.tools.ScaleCorpus /root/testdata/sf0.1 $SCALE_DIR/x16 16"
fi

run_bench() {
  local dir="$1" tag="$2"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_ONLY="$ENTRIES" \
  SPARK_GRAFT_RUNS="$RUNS" SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch "runMain graft.Bench" 2>"$SCALE_DIR/bench_$tag.err" \
    | grep -F '"metric"' | tail -1 > "$SCALE_DIR/bench_$tag.json"
  echo "== $tag:"
  cat "$SCALE_DIR/bench_$tag.json"
}

run_bench /root/testdata/sf0.1 x1
run_bench "$SCALE_DIR/x4" x4
run_bench "$SCALE_DIR/x16" x16
