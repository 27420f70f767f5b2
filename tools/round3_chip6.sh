#!/bin/bash
# Round-3 chip phase 6: redo the phase-2 items lost to the relay wedge
# (the sweep crash at the over-budget shape wedged the relay; synth
# profile + stream demos failed at backend init). Lesson applied: poll
# the relay BEFORE EVERY item, not once per phase.
# Usage: bash tools/round3_chip6.sh <pid-of-phase5>
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for phase-5 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
wait_relay() {
  until timeout 240 python -c "import jax; print(jax.devices())" \
        >/dev/null 2>&1; do sleep 120; done
}
mkdir -p runs/r3 docs/results_r3

snap() {
  local name=$1; shift
  for f in "$@"; do
    [ -e "$f" ] && cp -r "$f" "docs/results_r3/$(basename "$f")"
  done
  for i in 1 2 3; do
    if git add docs/results_r3 golf_tpu/ops/allpole_dispatch.json \
        2>/dev/null; then :; else git add docs/results_r3; fi
    if git commit -q -m "round 3 perf evidence: $name"; then break; fi
    sleep 7
  done
  git log --oneline -1
}

# 1. dispatch sweep with the incremental-write + footprint-cap fix
if [ ! -e golf_tpu/ops/allpole_dispatch.json ]; then
  log "polling relay"; wait_relay; log "relay up"
  log "allpole sweep (fixed tool)"
  timeout 7200 python tools/allpole_sweep.py --grid mid \
      > runs/r3/allpole_sweep3.log 2>&1
  tail -6 runs/r3/allpole_sweep3.log
  snap sweep3 runs/r3/allpole_sweep3.log
fi

# 2. per-stage profile
if [ ! -s runs/r3/synth_profile.json ]; then
  log "polling relay"; wait_relay; log "relay up"
  log "synth profile (retry)"
  timeout 3600 python tools/synth_profile.py \
      > runs/r3/synth_profile.json 2> runs/r3/synth_profile.err
  cat runs/r3/synth_profile.json
  snap profile2 runs/r3/synth_profile.json
fi

# 3. exact-causal streaming demo
CKPT=runs/r3/golf_ss2b/ckpt/last
if [ -e "$CKPT" ] && [ ! -s runs/r3/stream_enc_L24.json ]; then
  for L in 12 24 48; do
    log "polling relay"; wait_relay; log "relay up"
    log "stream demo --enc_stream $L"
    timeout 3600 python scripts/stream_demo.py \
        --config cfg/ae/synthetic-mid.yaml \
        --model cfg/ae/decoder/golf-precise-stable.yaml \
        --ckpt_path "$CKPT" --enc_stream $L \
        > runs/r3/stream_enc_L$L.json \
        2> runs/r3/stream_enc_L$L.err
    tail -2 runs/r3/stream_enc_L$L.err
    cat runs/r3/stream_enc_L$L.json
  done
  snap enc_stream2 runs/r3/stream_enc_L12.json runs/r3/stream_enc_L12.err \
      runs/r3/stream_enc_L24.json runs/r3/stream_enc_L24.err \
      runs/r3/stream_enc_L48.json runs/r3/stream_enc_L48.err
fi
log "phase 6 complete"
