#!/usr/bin/env bash
# Key-SKEW probe — the fourth corpus axis, after breadth
# (tools/scale_probe.sh: k-fold keys), per-key depth
# (tools/depth_probe.sh: k-fold events per key, uniformly) and
# document length (tools/length_probe.sh). All three grow VOLUME but
# keep the key distribution balanced, so no probe has ever measured
# IMBALANCE — the mega-NAT scenario the reference's HTTP session
# detector exists for (one source address absorbing a large share of
# ALL traffic). graft.ScaleGen's skew mode holds every table's row
# count and content constant and reassigns a deterministic k PERCENT
# of events onto hot key 0, so the 0pct control and every skew point
# share one physical volume and the only variable is distribution
# shape: wall-time growth across k is PURE load-imbalance cost.
#
# The probe composes skew over a DEPTH-mode base (default 100x:
# 10M events, 1500 keys) because skew over raw sf0.1 (100k events)
# puts only ~50k rows on the hot key — too small to straggle. At the
# 50pct point the hot key holds 5M events: ~750x deeper than any key
# the depth probe tested.
#
# Expected class split (the claim under test):
#   immune   — hash-agg family (q02): map-side partial combine
#              collapses the hot key inside every input partition
#              before the exchange, so the reducer never sees the
#              imbalance.
#   exposed  — per-key-serial family (q52/q42/q14/q141/q69/q46):
#              one sort partition / one group scan holds the hot
#              key's whole share; the bound is single-task time on
#              k percent of the corpus (straggler, spill — NOT OOM:
#              sorts are external, group scans are iterator-based).
#
# Usage: tools/skew_probe.sh [outRoot] [skews] [runs] [queries] [depthK]
#   defaults: outRoot=/tmp/graft-skew, skews="0 10 50", runs=2,
#             depthK=100
set -eu
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/graft-skew}"
SKEWS="${2:-0 10 50}"
RUNS="${3:-2}"
SRC=/root/testdata/sf0.1
mkdir -p "$OUT"

QUERIES="${4:-q02_hard_limit,q52_alias_abuse,q42_session_summary,q169_session_summary_sharded,q14_session_limit,q141_suppress_count,q69_sequence_abuse,q46_private_relay}"
DEPTHK="${5:-100}"

# the deep base. NEVER adopt a dir without a matching provenance
# marker: a stale base from another round (different SRC, or an older
# generator whose depth jitter has since changed) would make every
# skew point measure the wrong corpus — the exact stale-/tmp trap the
# verify skill documents, which must not be baked into a harness.
BASE="$OUT/base_${DEPTHK}x"
MARKER="$SRC depth $DEPTHK v-us-jitter"
if [ ! -d "$BASE/events.parquet" ] \
    || [ "$(cat "$BASE/.graft_base" 2>/dev/null)" != "$MARKER" ]; then
  echo "== scalegen depth ${DEPTHK}x (skew base) -> $BASE =="
  rm -rf "$BASE"
  if ! sbt -batch "runMain graft.ScaleGen $SRC $BASE $DEPTHK depth" \
      > "$OUT/scalegen_base.log" 2>&1; then
    echo "SCALEGEN FAILED for depth base (log: $OUT/scalegen_base.log)" >&2
    exit 1
  fi
  echo "$MARKER" > "$BASE/.graft_base"
fi

for k in $SKEWS; do
  dir="$OUT/${k}pct"
  KMARKER="$MARKER skew $k"
  if [ ! -d "$dir/events.parquet" ] \
      || [ "$(cat "$dir/.graft_base" 2>/dev/null)" != "$KMARKER" ]; then
    echo "== scalegen skew ${k}pct over $BASE -> $dir =="
    rm -rf "$dir"
    if ! sbt -batch "runMain graft.ScaleGen $BASE $dir $k skew" \
        > "$OUT/scalegen_${k}pct.log" 2>&1; then
      echo "SCALEGEN FAILED for skew ${k}pct (log: $OUT/scalegen_${k}pct.log)" >&2
      exit 1
    fi
    echo "$KMARKER" > "$dir/.graft_base"
    grep -E "scalegen" "$OUT/scalegen_${k}pct.log" || true
  fi
done

for k in $SKEWS; do
  dir="$OUT/${k}pct"
  echo "== skew probe ${k}pct =="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
    SPARK_GRAFT_BENCH_QUERIES="$QUERIES" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*' | tail -1 | tee "$OUT/probe_${k}pct.json"
  if ! grep -q '"valid":true' "$OUT/probe_${k}pct.json"; then
    echo "SKEW PROBE FAILED at ${k}pct — a crash on the hot key is the" \
      "single-key-blowup symptom this probe exists to catch" >&2
    exit 1
  fi
done

echo "== skew probe done; constant volume means NO exponent fit —"
echo "   report per-query ratios vs the 0pct control =="
