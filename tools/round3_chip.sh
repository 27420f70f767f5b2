#!/bin/bash
# Round-3 chip pipeline: (1) fixed all-pole dispatch sweep (VERDICT #3),
# committed immediately; (2) the round-3 evidence queue (VERDICT #1/#4/#6).
# Serialized so only one process owns the TPU relay at a time.
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }

log "polling relay"
until timeout 240 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
  sleep 120
done
log "relay up"

mkdir -p runs/r3 docs/results_r3
if [ ! -e golf_tpu/ops/allpole_dispatch.json ]; then
  log "allpole dispatch sweep (mid grid)"
  timeout 7200 python tools/allpole_sweep.py --grid mid \
      > runs/r3/allpole_sweep.log 2>&1
  if [ -e golf_tpu/ops/allpole_dispatch.json ]; then
    cp runs/r3/allpole_sweep.log docs/results_r3/
    for i in 1 2 3; do
      if git add golf_tpu/ops/allpole_dispatch.json docs/results_r3 && \
         git commit -q -m "Re-run fixed all-pole dispatch sweep (post XLA-CSE fix): record measured pallas/blocked crossovers" \
         --only golf_tpu/ops/allpole_dispatch.json docs/results_r3; then
        break
      fi
      sleep 7
    done
  else
    log "sweep produced no table; continuing"
  fi
fi

log "starting evidence queue"
bash tools/round3_queue.sh
log "chip pipeline complete"
