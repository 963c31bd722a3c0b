#!/bin/bash
# Batched TPU A/B for the SAI_ATTN folded-attention formulations
# (models/attention.py). One sequential run so the serialized
# remote-compile helper never sees concurrent clients; NO external
# timeout-kill around compiles (bench.py self-protects via
# SAI_BENCH_DEVICE_DEADLINE_S; bench_kmax is cache-warm after the first
# leg). Legacy CLIP headline baseline measured same-day: 141.01 fps.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/ab_attn}
mkdir -p "$OUT"

echo "=== leg 1: folded CLIP headline bench ==="
SAI_ATTN=folded SAI_BENCH_FULL_SKIP=1 python bench.py \
  > "$OUT/clip_folded.json" 2> "$OUT/clip_folded.err"
tail -1 "$OUT/clip_folded.json"

echo "=== leg 2: kMaX legacy ==="
SAI_ATTN=legacy python benchmarks/bench_kmax.py \
  > "$OUT/kmax_legacy.json" 2> "$OUT/kmax_legacy.err"
cat "$OUT/kmax_legacy.json"

echo "=== leg 3: kMaX folded ==="
SAI_ATTN=folded python benchmarks/bench_kmax.py \
  > "$OUT/kmax_folded.json" 2> "$OUT/kmax_folded.err"
cat "$OUT/kmax_folded.json"
