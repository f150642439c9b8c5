#!/bin/bash
# Interleaved A/B for the round-6 second-pass changes (minhash long-
# domain agg, incremental sa restriction, funnel caches).  Alternates
# old (stash) / new per round so both sides sample the same host
# phases.  Usage: bash BENCH/ab_r06b.sh <rounds> <out_prefix>
set -e
cd /root/repo
ROUNDS=${1:-2}
PFX=${2:-/tmp/ab}
QUERIES="doc_minhash_lsh doc_minhash_lsh_capped lsh_dropped_buckets doc_neardup_clusters doc_split_leakage doc_incremental_neardup corpus_build_funnel corpus_train_shards"
for r in $(seq 1 "$ROUNDS"); do
  echo "=== round $r OLD (stashed) ==="
  git stash push -q -m ab_r06b
  REPEATS=2 python bench_extra.py $QUERIES > "${PFX}_old_r${r}.json" 2>/dev/null
  git stash pop -q
  echo "=== round $r NEW ==="
  REPEATS=2 python bench_extra.py $QUERIES > "${PFX}_new_r${r}.json" 2>/dev/null
done
echo DONE
