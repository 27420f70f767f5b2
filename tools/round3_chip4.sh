#!/bin/bash
# Round-3 chip phase 4: training-side perf evidence — honest train
# profile + train bench, and the FFT-size probe that decides whether
# _fft_frame_conv should use snug 5-smooth sizes instead of pow2.
# Usage: bash tools/round3_chip4.sh <pid-of-phase3>
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for phase-3 pid $WAIT_PID"
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
    if git add docs/results_r3 && \
       git commit -q -m "round 3 evidence: $name" --only docs/results_r3
    then break; fi
    sleep 7
  done
  git log --oneline -1
}

if [ ! -e runs/r3/fft_size_probe.log ]; then
  log "fft size probe"
  timeout 3600 python tools/fft_size_probe.py \
      > runs/r3/fft_size_probe.log 2>&1
  tail -12 runs/r3/fft_size_probe.log
  snap fft_probe runs/r3/fft_size_probe.log
fi

if [ ! -e runs/r3/train_bench.log ]; then
  log "train bench"
  timeout 3600 python tools/train_bench.py > runs/r3/train_bench.log 2>&1
  tail -6 runs/r3/train_bench.log
  snap train_bench runs/r3/train_bench.log
fi

if [ ! -e runs/r3/train_profile.log ]; then
  log "train profile"
  timeout 3600 python tools/train_profile.py \
      > runs/r3/train_profile.log 2>&1
  tail -8 runs/r3/train_profile.log
  snap train_profile runs/r3/train_profile.log
fi

log "phase 4 complete"
