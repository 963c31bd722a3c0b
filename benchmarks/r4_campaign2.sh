#!/bin/bash
# Round-4 campaign, part 2: the steps part 1 could not complete —
# tile-DMA A/B (after the Mosaic divisibility-proof fix) and the three
# 500-frame full-bench runs. Same serialization + logging contract as
# r4_campaign.sh.
set -u
cd /root/repo
OUT=/tmp/r4tpu
mkdir -p "$OUT"

stamp() { date -u +%H:%M:%S; }
log() { echo "[$(stamp)] $*" | tee -a "$OUT/campaign.log"; }

probe() {
  timeout 110 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))+1)[0,0]))" >/dev/null 2>&1
}

log "campaign2 start"
if ! probe; then log "tunnel DOWN at start; aborting"; exit 3; fi
log "tunnel healthy"

log "tiledma(fixed) start"
python benchmarks/probe_tiledma.py >"$OUT/tiledma2.log" 2>&1
log "tiledma(fixed) rc=$?"

if probe; then
  log "500f stride1 start"
  SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_FULL_DEADLINE_S=3000 \
    python bench.py >"$OUT/full500_s1.log" 2>&1
  log "500f stride1 rc=$?"
else
  log "tunnel down before 500f s1; skipping"
fi

if probe; then
  log "500f stride2 start"
  SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_SEG_STRIDE=2 \
    SAI_BENCH_FULL_DEADLINE_S=3000 \
    python bench.py >"$OUT/full500_s2.log" 2>&1
  log "500f stride2 rc=$?"
else
  log "tunnel down before 500f s2; skipping"
fi

if probe; then
  log "500f stride2 chunk16 start"
  SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_SEG_STRIDE=2 \
    SAI_BENCH_FULL_CHUNK=16 SAI_BENCH_FULL_DEADLINE_S=3000 \
    python bench.py >"$OUT/full500_s2c16.log" 2>&1
  log "500f stride2 chunk16 rc=$?"
else
  log "tunnel down before 500f s2c16; skipping"
fi

log "campaign2 done"
