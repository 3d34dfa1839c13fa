#!/usr/bin/env bash
# Empirical scale probe for the heavy dedup/ANN/curation family:
# generate k-fold synthetic corpora from sf0.1 (graft.ScaleGen — each
# copy pairwise-dissimilar, so near-dup structure scales ~k-fold
# instead of deepening), time the heavy queries at each scale through
# the regular Bench harness (same warmup + min-of-n methodology), and
# print per-query times ready for exponent fitting (tools/
# scale_fit.py turns the three JSON lines into a SCALING.md table).
#
# Usage: tools/scale_probe.sh [outRoot] [scales] [runs] [queries]
#   defaults: outRoot=/tmp/graft-scale, scales="1 3 10", runs=2,
#   queries=the heavy family below (pass a comma-separated list to
#   probe a subset, e.g. a single operator at a new scale point)
set -eu
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/graft-scale}"
SCALES="${2:-1 3 10}"
RUNS="${3:-2}"
SRC=/root/testdata/sf0.1
mkdir -p "$OUT"

# the heavy family (the 100 TB claims under test) + the path-equality
# contrasts (classic vs patch-set line/chunk dedup — the advantage
# should GROW with scale)
QUERIES="${4:-q16_ngram_jaccard,q17_minhash_lsh,q53_dedup_clusters,q76_cc_stars,q87_exact_substring,q93_semantic_dedup,q99_winnowing,q109_keep_best,q115_containment,q119_ngram_novelty,q127_overlap_measures,q130_bloom_decontaminate,q91_line_dedup,q128_line_patches,q138_chunk_rewrite,q139_chunk_patches,q142_corpus_rewrite,q15_exact_dedup,q64_corpus_curate}"

for k in $SCALES; do
  dir="$OUT/${k}x"
  # ALL tables must exist — a crash between the writes must not
  # leave a half-corpus that every later run silently probes (and a
  # pre-r13 corpus without events.parquet regenerates)
  if [ ! -d "$dir/documents.parquet" ] || [ ! -d "$dir/embeddings.parquet" ] \
      || [ ! -d "$dir/events.parquet" ]; then
    echo "== scalegen ${k}x -> $dir =="
    rm -rf "$dir"
    # the embedding cyclic-shift isometry has period = vector dim
    # (64): past ~half that, cap the embeddings table and treat the
    # corpus as a TEXT scale point (probe only text queries there)
    embk=""
    if [ "$k" -ge 64 ]; then embk=" 32"; fi
    if ! sbt -batch "runMain graft.ScaleGen $SRC $dir $k$embk" > "$OUT/scalegen_${k}x.log" 2>&1; then
      echo "SCALEGEN FAILED for ${k}x (log: $OUT/scalegen_${k}x.log)" >&2
      exit 1
    fi
    grep -E "scalegen" "$OUT/scalegen_${k}x.log" || true
  fi
done

for k in $SCALES; do
  dir="$OUT/${k}x"
  echo "== probe ${k}x =="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
    SPARK_GRAFT_BENCH_QUERIES="$QUERIES" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*' | tail -1 | tee "$OUT/probe_${k}x.json"
  # a probe whose Bench reported failures must stop the sweep — a
  # crash at the LARGEST scale is exactly the super-linear symptom
  # the probe exists to catch, not a row to drop
  if ! grep -q '"valid":true' "$OUT/probe_${k}x.json"; then
    echo "PROBE INVALID at ${k}x (failed queries in the contract line above)" >&2
    exit 1
  fi
done

echo "== probe done; fit exponents: python3 tools/scale_fit.py $OUT =="
