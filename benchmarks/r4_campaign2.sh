#!/bin/bash
# Round-4 campaign, part 2: tile-DMA A/B (post Mosaic fixes; its programs
# are pre-compiled into the persistent cache) and the three 500-frame
# full-bench runs. The tunnel FLAPS (one probe passes, the next fails), so
# probing between steps forfeits whole windows: each step instead runs
# unconditionally under its own protection — bench.py has a deadline
# watchdog (rc 3 + diagnosis), the probe gets a bounded timeout (safe to
# kill: its compiles are already cached, so no in-flight helper job is
# orphaned).
set -u
cd /root/repo
OUT=/tmp/r4tpu
mkdir -p "$OUT"

stamp() { date -u +%H:%M:%S; }
log() { echo "[$(stamp)] $*" | tee -a "$OUT/campaign.log"; }

log "campaign2 start (no inter-step probes)"

log "tiledma(fixed) start"
timeout 1800 python benchmarks/probe_tiledma.py >"$OUT/tiledma2.log" 2>&1
log "tiledma(fixed) rc=$?"

log "500f stride1 start"
SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_FULL_DEADLINE_S=2400 \
  python bench.py >"$OUT/full500_s1.log" 2>&1
log "500f stride1 rc=$?"

log "500f stride2 start"
SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_SEG_STRIDE=2 \
  SAI_BENCH_FULL_DEADLINE_S=2400 \
  python bench.py >"$OUT/full500_s2.log" 2>&1
log "500f stride2 rc=$?"

log "500f stride2 chunk16 start"
SAI_BENCH_FULL=1 SAI_BENCH_FULL_FRAMES=500 SAI_BENCH_SEG_STRIDE=2 \
  SAI_BENCH_FULL_CHUNK=16 SAI_BENCH_FULL_DEADLINE_S=2400 \
  python bench.py >"$OUT/full500_s2c16.log" 2>&1
log "500f stride2 chunk16 rc=$?"

log "campaign2 done"
