#!/bin/bash
# Retry the round-4 TPU campaign until the tunnel recovers (observed
# multi-hour outages).  Probes every ~8 min; while /tmp/r4tpu/hold exists
# (builder running the CPU test suite on this 1-vCPU host) it waits even
# if healthy, so benches never time-share with pytest.
set -u
OUT=/tmp/r4tpu
mkdir -p "$OUT"
log() { echo "[$(date -u +%H:%M:%S)] $*" >>"$OUT/watch.log"; }

log "watcher start"
for i in $(seq 1 30); do
  if [ -e "$OUT/hold" ]; then
    log "hold file present; sleeping"
    sleep 240
    continue
  fi
  if timeout 110 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))+1)[0,0]))" >/dev/null 2>&1; then
    log "tunnel healthy on attempt $i; launching campaign"
    bash /root/repo/benchmarks/${SAI_CAMPAIGN:-r4_campaign.sh}
    log "campaign rc=$?"
    exit 0
  fi
  log "attempt $i: tunnel down"
  sleep 480
done
log "gave up after 30 attempts"
exit 3
