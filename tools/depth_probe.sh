#!/usr/bin/env bash
# Per-key DEPTH probe — the inverse axis of tools/scale_probe.sh.
# scale_probe's breadth corpora stride user_id per copy (k-fold ACTORS
# at constant per-key depth), which proves the key-cardinality axis but
# never grows one key's event count. This probe densifies instead:
# graft.ScaleGen's depth mode keeps user_id UNCHANGED and jitters each
# copy by `copy` milliseconds, so every key carries k-fold events
# inside the SAME session/window structure — the mega-NAT / bot-account
# shape (the reference's 45-min session windows are keyed by source IP,
# HTTPRequest.java:151-163, exactly where a NAT concentrates traffic).
# The per-key-LINEAR family under test: session-window sorts
# (q52/q42/q14), suppression/secondary-sort scans (q141/q46), and the
# sorted-group sequence pairing (q69) — the claim being probed is
# "a hot key degrades to a bigger sort spill, not an executor OOM"
# (CustomsDetectors.scala:41).
#
# Usage: tools/depth_probe.sh [outRoot] [scales] [runs] [queries]
#   defaults: outRoot=/tmp/graft-depth, scales="1 10 100", runs=2
set -eu
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/graft-depth}"
SCALES="${2:-1 10 100}"
RUNS="${3:-2}"
SRC=/root/testdata/sf0.1
mkdir -p "$OUT"

QUERIES="${4:-q52_alias_abuse,q42_session_summary,q14_session_limit,q141_suppress_count,q69_sequence_abuse,q46_private_relay}"

for k in $SCALES; do
  dir="$OUT/${k}x"
  if [ ! -d "$dir/documents.parquet" ] || [ ! -d "$dir/embeddings.parquet" ] \
      || [ ! -d "$dir/events.parquet" ]; then
    echo "== scalegen depth ${k}x -> $dir =="
    rm -rf "$dir"
    if ! sbt -batch "runMain graft.ScaleGen $SRC $dir $k depth" \
        > "$OUT/scalegen_${k}x.log" 2>&1; then
      echo "SCALEGEN FAILED for depth ${k}x (log: $OUT/scalegen_${k}x.log)" >&2
      exit 1
    fi
    grep -E "scalegen" "$OUT/scalegen_${k}x.log" || true
  fi
done

for k in $SCALES; do
  dir="$OUT/${k}x"
  echo "== depth probe ${k}x =="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
    SPARK_GRAFT_BENCH_QUERIES="$QUERIES" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*' | tail -1 | tee "$OUT/probe_${k}x.json"
  if ! grep -q '"valid":true' "$OUT/probe_${k}x.json"; then
    echo "DEPTH PROBE FAILED at ${k}x — a crash at the deepest key is" \
      "the super-linear symptom this probe exists to catch" >&2
    exit 1
  fi
done

echo "== depth probe done; fit exponents with: =="
echo "python3 tools/scale_fit.py $OUT"
