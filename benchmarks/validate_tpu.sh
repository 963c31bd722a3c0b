#!/bin/bash
# One-shot TPU validation batch: run after deploys (or tunnel outages) to
# re-validate every judge-/operator-facing device surface in ONE serialized
# sequence (parallel compile experiments queue against each other on the
# remote-compile helper — see CLAUDE.md). Logs land in $OUT (default
# /tmp/tpu_validation).
#
#   bash benchmarks/validate_tpu.sh [OUT_DIR]
#
# Sequence: health probe -> headline bench -> full labeled-pipeline bench
# -> kMaX phase bench -> end-to-end product demo. Each step appends to
# summary.txt; a failed step records its rc and the batch continues.
set -u
OUT="${1:-/tmp/tpu_validation}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
SUMMARY="$OUT/summary.txt"
: > "$SUMMARY"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

step() { # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  note "START $name"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  note "END $name rc=$rc $(tail -c 200 "$OUT/$name.out" | tr '\n' ' ')"
  return 0
}

# 1. health: tiny dispatch+sync (bench.py's own probe logic, 5 min cap)
step health 300 python -c "
import time; t0=time.time()
import jax, jax.numpy as jnp
print('device', jax.devices()[0].device_kind)
print('roundtrip_s', round(time.time()-t0,1), float((jnp.ones((8,128))+1)[0,0]))
"
grep -q roundtrip_s "$OUT/health.out" || {
  note "ABORT: device unreachable; try again later"; exit 3; }

# 2. headline fused bench (driver contract line)
step bench_default 1800 python bench.py

# 3. full labeled pipeline estimate (kMaX + fusion + postproc + query)
step bench_full 3600 env SAI_BENCH_FULL=1 python bench.py

# 4. kMaX device phase breakdown
step bench_kmax2 1800 python benchmarks/bench_kmax2.py

# 5. end-to-end product loop (reconstruct, query, learn, missing-object)
step demo 3600 python examples/demo.py "$OUT/demo_scene"

# 6. integrator A/B: brick frustum culling vs sparse, default + fine grid
#    (grid/brick.py; expected to win where frames see part of the grid)
step bench_brick 1800 env SAI_BENCH_INTEGRATOR=brick python bench.py
step bench_sparse_fine 2400 env SAI_BENCH_INTEGRATOR=sparse \
    SAI_BENCH_VOXEL=0.02 python bench.py
step bench_brick_fine 2400 env SAI_BENCH_INTEGRATOR=brick \
    SAI_BENCH_VOXEL=0.02 python bench.py

# 7. depthwise-conv sizing: is a fused dwconv->LN->MLP kernel worth it?
step bench_dwconv 1800 python benchmarks/bench_dwconv.py

# 7b. shift-MAC dwconv in the real backbone (SAI_DWCONV=shift): same-batch
#     A/B against step 4's default grouped-conv numbers
step bench_kmax2_shift 1800 env SAI_DWCONV=shift \
    python benchmarks/bench_kmax2.py

# 8. voxel-sharded fuse with adaptive per-shard budgets, real chip
#    (1-device mesh: exercises the shard_map path + budget growth on TPU)
step bench_sharded 3600 env SAI_SHARD_VOXELS=1 SAI_BENCH_INTEGRATOR=brick \
    SAI_BENCH_FULL=1 python bench.py

note "batch complete; see $OUT/*.out"
