#!/bin/bash
# Round-4 ss diagnosis, phase 2. Variants A (lr=1e-6/clip=0.1) and B
# (cap 0.95) both drifted UP (3.19 -> 3.66 / 3.76) like the round-3
# recipe — the drift survives a 5x lr cut and a hard clip, so test the
# two remaining hypotheses directly:
#   C0 "lr0"  : lr=0 control, 1000 steps. If val still climbs, the
#               drift is the mutated stats/batch_stats, not updates.
#   C1 "sgd"  : plain SGD lr=1e-5, 3500 steps. Kills Adam's per-coord
#               normalization of heavy-tailed gradient noise (the
#               suspected mechanism: noise bias -> full-lr steps).
# Then evaluate whichever run held or improved on the 3.187 zero-shot
# start; otherwise publish the negative result.
set -u
cd /root/repo
mkdir -p runs/r4 docs/results_r4
log() { echo "== $* : $(date -u)"; }
snap() {
  local name=$1; shift
  for f in "$@"; do
    [ -e "$f" ] && cp -r "$f" "docs/results_r4/$(basename "$f")"
  done
  for i in 1 2 3; do
    git add docs/results_r4 && \
      git commit -q -m "round 4 evidence: $name" --only docs/results_r4 \
      && break; sleep 7
  done
  git log --oneline -1
}
wait_relay() {
  until timeout 300 python tools/relay_probe.py >/dev/null 2>&1; do
    log "relay compute still down"; sleep 120
  done
}
try_run() {
  local rd=$1; shift
  for i in $(seq 1 8); do
    "$@" && return 0
    log "attempt $i failed: $*"
    [ -n "$rd" ] && rm -rf "$rd"
    sleep 60; wait_relay
  done
  return 1
}
log "polling relay"; wait_relay; log "relay up"
MID="--config cfg/ae/synthetic-mid.yaml"
SMODEL=cfg/ae/decoder/golf-precise-stable.yaml

if [ ! -e runs/r4/ss_lr0/ckpt/last ]; then
  log "C0 lr=0 control (1000 steps)"
  try_run runs/r4/ss_lr0 \
      timeout 3600 python autoencode.py fit $MID --model $SMODEL \
      trainer.max_steps=1000 trainer.check_val_every_n_steps=250 \
      optimizer.init_args.lr=0.0 \
      ckpt_params_only=true ckpt_path=runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/ss_lr0 >> runs/r4/ss_lr0.fit.log 2>&1
  snap ss_lr0 runs/r4/ss_lr0.fit.log
fi

if [ ! -e runs/r4/ss_sgd/ckpt/last ]; then
  log "C1 SGD lr=1e-5 (3500 steps)"
  try_run runs/r4/ss_sgd \
      timeout 6000 python autoencode.py fit $MID --model $SMODEL \
      trainer.max_steps=3500 trainer.check_val_every_n_steps=500 \
      optimizer.class_path=torch.optim.SGD \
      optimizer.init_args.lr=0.00001 \
      model.init_args.coef_smooth_weight=0.1 \
      ckpt_params_only=true ckpt_path=runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/ss_sgd >> runs/r4/ss_sgd.fit.log 2>&1
  snap ss_sgd runs/r4/ss_sgd.fit.log
fi
log "round4_ss2 done"
