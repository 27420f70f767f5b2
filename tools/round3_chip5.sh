#!/bin/bash
# Round-3 chip phase 5: refresh the LPCNet test row with the f0-cents
# metric added in 4c8a03d (the queue's row predates it).
# Usage: bash tools/round3_chip5.sh <pid-of-phase4>
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for phase-4 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
log "polling relay"
until timeout 240 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do sleep 120; done
log "relay up"
if [ -e runs/r3/lpcnet/ckpt/last ]; then
  log "lpcnet test (with f0 cents)"
  timeout 3600 python main.py test --config cfg/lpcnet.yaml \
      data.class_path=ltng.data.Synthetic data.init_args.batch_size=16 \
      --ckpt_path runs/r3/lpcnet/ckpt/last \
      --run_dir runs/r3/lpcnet > runs/r3/lpcnet.test2.log 2>&1
  tail -1 runs/r3/lpcnet.test2.log
  cp runs/r3/lpcnet.test2.log docs/results_r3/
  for i in 1 2 3; do
    if git add docs/results_r3 && git commit -q \
        -m "round 3 evidence: lpcnet test row with f0-cents" \
        --only docs/results_r3; then break; fi
    sleep 7
  done
fi
log "phase 5 complete"
