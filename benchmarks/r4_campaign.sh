#!/bin/bash
# Round-4 pending TPU measurements, serialized (one compile client at a
# time — the remote-compile helper at 127.0.0.1:8103 serializes jobs and a
# killed client orphans its compile server-side).  Logs under /tmp/r4tpu.
set -u
cd /root/repo
OUT=/tmp/r4tpu
mkdir -p "$OUT"

stamp() { date -u +%H:%M:%S; }
log() { echo "[$(stamp)] $*" | tee -a "$OUT/campaign.log"; }

probe() {
  timeout 110 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))+1)[0,0]))" >/dev/null 2>&1
}

log "campaign start"
if ! probe; then log "tunnel DOWN at start; aborting"; exit 3; fi
log "tunnel healthy"

# 1. kMaX B=16 point (fast, known-good path; completes the batch curve)
log "kmax B=16 start"
SAI_BENCH_KMAX_BATCHES=8,16 SAI_BENCH_KMAX_REPS=3 \
  python benchmarks/bench_kmax_batch.py >"$OUT/kmax_b16.log" 2>&1
log "kmax B=16 rc=$?"

# 2. tile-DMA A/B (Pallas lowering; compile may be slow — no timeout-kill)
if probe; then
  log "tiledma start"
  python benchmarks/probe_tiledma.py >"$OUT/tiledma.log" 2>&1
  log "tiledma rc=$?"
else
  log "tunnel down before tiledma; skipping"
fi

# 3. 500-frame measured scan (VERDICT r3 #2), stride 1
if probe; then
  log "500f stride1 start"
  SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_FULL_DEADLINE_S=3000 \
    python bench.py >"$OUT/full500_s1.log" 2>&1
  log "500f stride1 rc=$?"
else
  log "tunnel down before 500f s1; skipping"
fi

# 4. 500-frame scan at segment_stride=2 (the stride A/B at scan scale)
if probe; then
  log "500f stride2 start"
  SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_SEG_STRIDE=2 \
    SAI_BENCH_FULL_DEADLINE_S=3000 \
    python bench.py >"$OUT/full500_s2.log" 2>&1
  log "500f stride2 rc=$?"
else
  log "tunnel down before 500f s2; skipping"
fi

# 5. stride 2 with chunk 16: stride halves the per-chunk kMaX batch
#    (B=4 is ~15% worse ms/frame than B=8 on the measured batch curve);
#    chunk 16 restores the B=8 point while F=16 ties F=8 on the fused bench
if probe; then
  log "500f stride2 chunk16 start"
  SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_SEG_STRIDE=2 \
    SAI_BENCH_FULL_CHUNK=16 SAI_BENCH_FULL_DEADLINE_S=3000 \
    python bench.py >"$OUT/full500_s2c16.log" 2>&1
  log "500f stride2 chunk16 rc=$?"
else
  log "tunnel down before 500f s2c16; skipping"
fi

log "campaign done"
