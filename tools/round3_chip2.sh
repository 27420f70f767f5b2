#!/bin/bash
# Round-3 chip phase 2: perf evidence with the relay-honest timing, run
# after the quality queue releases the chip. Usage:
#   bash tools/round3_chip2.sh <pid-of-phase1>   (waits for it to exit)
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for phase-1 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

log "polling relay"
until timeout 240 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
  sleep 120
done
log "relay up"
mkdir -p runs/r3 docs/results_r3

snap() {
  local name=$1; shift
  for f in "$@"; do
    [ -e "$f" ] && cp -r "$f" "docs/results_r3/$(basename "$f")"
  done
  for i in 1 2 3; do
    if git add docs/results_r3 golf_tpu/ops/allpole_dispatch.json \
         2>/dev/null || git add docs/results_r3; then :; fi
    if git commit -q -m "round 3 perf evidence: $name"; then break; fi
    sleep 7
  done
  git log --oneline -1
}

# 1. honest headline bench
if [ ! -e runs/r3/bench_r3.json ]; then
  log "bench.py (fetch-forced)"
  timeout 3600 python bench.py > runs/r3/bench_r3.json \
      2> runs/r3/bench_r3.err
  cat runs/r3/bench_r3.json runs/r3/bench_r3.err
  snap bench runs/r3/bench_r3.json runs/r3/bench_r3.err
fi

# 2. dispatch sweep (fetch-forced)
if [ ! -e golf_tpu/ops/allpole_dispatch.json ]; then
  log "allpole sweep (mid grid, fetch-forced)"
  timeout 7200 python tools/allpole_sweep.py --grid mid \
      > runs/r3/allpole_sweep2.log 2>&1
  tail -5 runs/r3/allpole_sweep2.log
  snap sweep runs/r3/allpole_sweep2.log
fi

# 3. per-stage profile (fetch-forced)
if [ ! -e runs/r3/synth_profile.json ]; then
  log "synth profile"
  timeout 3600 python tools/synth_profile.py \
      > runs/r3/synth_profile.json 2> runs/r3/synth_profile.err
  cat runs/r3/synth_profile.json
  snap profile runs/r3/synth_profile.json
fi

# 4. exact-causal streaming demo on a trained sample-wise checkpoint
CKPT=""
[ -e runs/r3/golf_ss2b/ckpt/last ] && CKPT=runs/r3/golf_ss2b/ckpt/last
if [ -n "$CKPT" ] && [ ! -e runs/r3/stream_enc.json ]; then
  for L in 12 24 48; do
    log "stream demo --enc_stream $L"
    timeout 3600 python scripts/stream_demo.py \
        --config cfg/ae/synthetic-mid.yaml \
        --model cfg/ae/decoder/golf-precise-stable.yaml \
        --ckpt_path "$CKPT" --enc_stream $L \
        > runs/r3/stream_enc_L$L.json \
        2> runs/r3/stream_enc_L$L.err
  done
  cp runs/r3/stream_enc_L24.json runs/r3/stream_enc.json 2>/dev/null
  snap enc_stream runs/r3/stream_enc_L12.json runs/r3/stream_enc_L12.err \
      runs/r3/stream_enc_L24.json runs/r3/stream_enc_L24.err \
      runs/r3/stream_enc_L48.json runs/r3/stream_enc_L48.err
fi

log "phase 2 complete"
