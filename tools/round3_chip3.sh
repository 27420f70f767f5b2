#!/bin/bash
# Round-3 chip phase 3: per-variant loss CURVES (VERDICT r2 weak #5 —
# the 600-step "plateau" claims need committed metric streams, and the
# round-2 metrics.jsonl files were wiped with runs/). Refits each
# remaining variant and commits fit/test logs + metrics.jsonl.
# Usage: bash tools/round3_chip3.sh <pid-of-phase2>
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for phase-2 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
log "polling relay"
until timeout 240 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
  sleep 120
done
log "relay up"
mkdir -p runs/r3 docs/results_r3
MID="--config cfg/ae/synthetic-mid.yaml"

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

for dec in ddsp golf-v1 nhv mlsa world; do
  tag=var_${dec//-/_}
  if [ ! -e runs/r3/$tag.metrics.jsonl ]; then
    log "fit $tag (600 steps, curve capture)"
    timeout 4500 python autoencode.py fit $MID \
        --model cfg/ae/decoder/$dec.yaml \
        trainer.max_steps=600 trainer.check_val_every_n_steps=100 \
        --run_dir runs/r3/$tag > runs/r3/$tag.fit.log 2>&1
    if [ -e runs/r3/$tag/ckpt/last ]; then
      timeout 1800 python autoencode.py test $MID \
          --model cfg/ae/decoder/$dec.yaml \
          --ckpt_path runs/r3/$tag/ckpt/last \
          --run_dir runs/r3/$tag > runs/r3/$tag.test.log 2>&1
      cp runs/r3/$tag/metrics.jsonl runs/r3/$tag.metrics.jsonl
      snap $tag runs/r3/$tag.fit.log runs/r3/$tag.test.log \
          runs/r3/$tag.metrics.jsonl
    fi
  fi
done
log "phase 3 complete"
