#!/usr/bin/env bash
# Document-LENGTH probe — the third scaling axis, after breadth
# (tools/scale_probe.sh: k-fold docs) and per-key depth
# (tools/depth_probe.sh: k-fold events per key). Neither grows text
# per document, so the per-row-text family had only ever seen
# sf-shaped (~300-char) docs while its real failure shape is one
# megadoc (concatenated logs, minified JS surviving stripHtml) holding
# an O(doc-length) structure in a single row. graft.ScaleGen's length
# mode keeps the doc COUNT constant and makes each document the
# space-joined concatenation of k per-copy-ciphered copies of itself
# (see ScaleGen.scala), so per-doc text grows k-fold at the source's
# structural density with no manufactured cross-copy repetition.
#
# The family under test, one query per per-row-text operator class:
#   q160 langId        (trigram profile — capped at maxChars: the
#                       probe's expectation is near-FLAT, the cap is
#                       the whole point)
#   q96  BPE encode    (longest-match tokenization, O(len) per doc)
#   q99  winnowing     (k-gram fingerprints + window minima)
#   q18  simhash       (shingle hash + bit-majority)
#   q153 stripHtml     (tag/entity strip, O(len) regex state machine)
#   q97  chunking      (token-window spans)
#
# Usage: tools/length_probe.sh [outRoot] [scales] [runs] [queries]
#   defaults: outRoot=/tmp/graft-length, scales="1 10 100", runs=2
set -eu
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/graft-length}"
SCALES="${2:-1 10 100}"
RUNS="${3:-2}"
SRC=/root/testdata/sf0.1
mkdir -p "$OUT"

QUERIES="${4:-q160_lang_id,q96_bpe_encode,q99_winnowing,q18_simhash,q153_html_strip,q97_chunk_documents}"

for k in $SCALES; do
  dir="$OUT/${k}x"
  if [ ! -d "$dir/documents.parquet" ] || [ ! -d "$dir/embeddings.parquet" ] \
      || [ ! -d "$dir/events.parquet" ]; then
    echo "== scalegen length ${k}x -> $dir =="
    rm -rf "$dir"
    if ! sbt -batch "runMain graft.ScaleGen $SRC $dir $k length" \
        > "$OUT/scalegen_${k}x.log" 2>&1; then
      echo "SCALEGEN FAILED for length ${k}x (log: $OUT/scalegen_${k}x.log)" >&2
      exit 1
    fi
    grep -E "scalegen" "$OUT/scalegen_${k}x.log" || true
  fi
done

for k in $SCALES; do
  dir="$OUT/${k}x"
  echo "== length probe ${k}x =="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
    SPARK_GRAFT_BENCH_QUERIES="$QUERIES" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*' | tail -1 | tee "$OUT/probe_${k}x.json"
  if ! grep -q '"valid":true' "$OUT/probe_${k}x.json"; then
    echo "LENGTH PROBE FAILED at ${k}x — a crash on the longest doc is" \
      "the single-row-blowup symptom this probe exists to catch" >&2
    exit 1
  fi
done

echo "== length probe done; fit exponents with: =="
echo "python3 tools/scale_fit.py $OUT"
