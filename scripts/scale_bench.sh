#!/bin/bash
# Scaling-curve measurement (r12 verdict lead item): run the top-floor
# bench entries at 1x (sf0.1) and 4x/16x/64x synthesized corpora
# (graft.tools.ScaleCorpus output under target/scale) and capture
# per-entry timings. Subset runs never write BENCH_FULL history (Bench
# guards that), so this cannot poison the driver's revisit thresholds.
#
# query_join_ast_expand / query_join_ast_xfield are measured to 16x
# only: on the dense synthetic vocabulary every query of theirs matches
# a constant FRACTION of the corpus, so their exact-top-k work grows
# ~quadratically in corpus size by construction (SCALE.md discusses
# the bound) — at 64x that is hours of pure verify compute, not signal.
#
# ADVICE r13 hardening: missing corpora fail fast with the generator
# command instead of silently producing empty results; Bench's single
# JSON line is taken as the LAST metric line (tail -1) so a stray
# earlier match cannot corrupt the file; SPARK_GRAFT_CPUS honors the
# caller's override again.
set -u
ENTRIES="ann_bruteforce,ann_ivf,ann_ivfpq,dedup_minhash,dedup_substring_keep,cms_counts,bigram_logprob,stream_ingest_e2e,stream_cms_estimate,stream_dedup_vs_corpus_bucketed,stream_simhash_pairs,stream_join_clicks,stream_session_counts,pii_scrub_live,link_pagerank_pages_converged,link_pagerank_pages_personalized,link_hits_pages,query_join_ast,query_join_bool,search_topk,search_incremental,search_dsv2_write"
DENSE="query_join_ast_expand,query_join_ast_xfield,query_join_ast_pruned"
OUT=${1:-/root/repo/target/scale/results}
CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p "$OUT"
need_dir() {
  local dir=$1 mult=$2
  if [ ! -d "$dir" ]; then
    echo "FATAL: scale corpus $dir is missing." >&2
    echo "Generate it first:" >&2
    echo "  sbt \"runMain graft.tools.ScaleCorpus /root/testdata/sf0.1 $dir $mult\"" >&2
    exit 1
  fi
}
run_one() {
  local name=$1 dir=$2 only=$3 runs=$4
  echo "=== $name ($dir, runs=$runs)"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_RUNS="$runs" \
    SPARK_GRAFT_ONLY="$only" \
    sbt -batch "runMain graft.Bench" 2>"$OUT/$name.err" \
    | grep -F '"metric"' | tail -1 > "$OUT/$name.json"
  if [ ! -s "$OUT/$name.json" ]; then
    echo "FATAL: no metric line for $name — see $OUT/$name.err" >&2
    exit 1
  fi
  if grep -q '"omitted"' "$OUT/$name.json"; then
    echo "WARNING: $name output truncated entries (omitted field present)" >&2
  fi
  tail -c 300 "$OUT/$name.json"; echo
  sbt -batch "runMain graft.tools.IndexBuildBench $dir" 2>>"$OUT/$name.err" \
    | grep -F '"index_build"' | tail -1 > "$OUT/${name}_build.json"
  cat "$OUT/${name}_build.json"
}
need_dir /root/repo/target/scale/x4 4
need_dir /root/repo/target/scale/x16 16
need_dir /root/repo/target/scale/x64 64
run_one 1x  /root/testdata/sf0.1          "$ENTRIES,$DENSE" 2
run_one 4x  /root/repo/target/scale/x4    "$ENTRIES,$DENSE" 2
run_one 16x /root/repo/target/scale/x16   "$ENTRIES,$DENSE" 2
run_one 64x /root/repo/target/scale/x64   "$ENTRIES"        1
