#!/bin/bash
# Round-4 ss phase 3: the SGD finetune descends (Adam was the round-3
# pathology — tools/ss_grad_check.py). Extend it to 10k steps, fully
# evaluate it and the ff anchor (whose first test run was lost to a
# relay stall), and produce the honest quality table rows.
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

# ---- extend the SGD finetune to 10k -----------------------------------------
if [ ! -e runs/r4/ss_final/ckpt/last ]; then
  log "extend ss_sgd to 10k (SGD lr=1e-5)"
  try_run runs/r4/ss_final \
      timeout 9000 python autoencode.py fit $MID --model $SMODEL \
      trainer.max_steps=10000 trainer.check_val_every_n_steps=500 \
      optimizer.class_path=torch.optim.SGD \
      optimizer.init_args.lr=0.00001 \
      model.init_args.coef_smooth_weight=0.1 \
      ckpt_path=runs/r4/ss_sgd/ckpt/last \
      --run_dir runs/r4/ss_final >> runs/r4/ss_final.fit.log 2>&1
  snap ss_final runs/r4/ss_final.fit.log
fi

# ---- refs --------------------------------------------------------------------
if [ ! -d runs/r4/refs ]; then
  log "dump refs"
  timeout 900 python tools/dump_refs.py cfg/ae/synthetic-mid.yaml \
      runs/r4/refs > runs/r4/refs.log 2>&1
fi

# ---- anchor test row (first run lost to a relay stall) -----------------------
if ! grep -q avg_mcd runs/r4/golf_ff.test.log 2>/dev/null; then
  log "re-test golf_ff"
  try_run "" \
      timeout 1800 python autoencode.py test $MID \
      --model cfg/ae/decoder/golf.yaml \
      --ckpt_path runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/golf_ff > runs/r4/golf_ff.test.log 2>&1
  snap golf_ff_test runs/r4/golf_ff.test.log
fi

# ---- full eval: ss_final and the anchor -------------------------------------
if [ -e runs/r4/ss_final/ckpt/last ] && \
   ! grep -q avg_mcd runs/r4/ss_final.test.log 2>/dev/null; then
  log "test+predict ss_final"
  try_run "" \
      timeout 1800 python autoencode.py test $MID --model $SMODEL \
      --ckpt_path runs/r4/ss_final/ckpt/last \
      --run_dir runs/r4/ss_final > runs/r4/ss_final.test.log 2>&1
  try_run "" \
      timeout 2400 python autoencode.py predict $MID --model $SMODEL \
      --ckpt_path runs/r4/ss_final/ckpt/last \
      --run_dir runs/r4/ss_final > runs/r4/ss_final.predict.log 2>&1
  if [ -d runs/r4/ss_final/predictions ]; then
    timeout 1200 python eval_pesq.py runs/r4/refs \
        runs/r4/ss_final/predictions > runs/r4/ss_final.pesq.log 2>&1
    timeout 1200 python fad.py runs/r4/refs runs/r4/ss_final/predictions \
        > runs/r4/ss_final.fad.log 2>&1
  fi
  cp runs/r4/ss_final/metrics.jsonl runs/r4/ss_final.metrics.jsonl \
      2>/dev/null
  snap ss_final_eval runs/r4/ss_final.test.log runs/r4/ss_final.pesq.log \
      runs/r4/ss_final.fad.log runs/r4/ss_final.predict.log \
      runs/r4/ss_final.metrics.jsonl
fi
if [ ! -e runs/r4/golf_ff.pesq.log ]; then
  log "predict+pesq+fad golf_ff (anchor row)"
  try_run "" \
      timeout 2400 python autoencode.py predict $MID \
      --model cfg/ae/decoder/golf.yaml \
      --ckpt_path runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/golf_ff > runs/r4/golf_ff.predict.log 2>&1
  if [ -d runs/r4/golf_ff/predictions ]; then
    timeout 1200 python eval_pesq.py runs/r4/refs \
        runs/r4/golf_ff/predictions > runs/r4/golf_ff.pesq.log 2>&1
    timeout 1200 python fad.py runs/r4/refs runs/r4/golf_ff/predictions \
        > runs/r4/golf_ff.fad.log 2>&1
  fi
  snap golf_ff_eval runs/r4/golf_ff.predict.log runs/r4/golf_ff.pesq.log \
      runs/r4/golf_ff.fad.log
fi
log "round4_ss3 done"
