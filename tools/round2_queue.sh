#!/bin/bash
# Round-2 sequential TPU training queue (one chip — runs must serialize).
#
# Stage 1: GOLF-ff to plateau (10k steps) — the reference's primary recipe.
# Stage 2: convert to sample-wise (GOLF-ss) and finetune from the ff
#          checkpoint at reduced lr + coefficient-smoothness regularizer
#          (reference playbook, README.md:92-94) for >=10k steps — the
#          "GOLF-ss converges" evidence.
# Stage 3: remaining decoder variants to plateau (3k steps each) for the
#          per-variant convergence table; test (MSS+MCD) after each fit.
#
# Logs + checkpoints under runs/r2/<name>/.
set -u
cd /root/repo
mkdir -p runs/r2

run_fit () {
  local name=$1; shift
  if [ -f "runs/r2/$name/.done_fit" ]; then
    echo "== $name fit already done, skipping"; return 0
  fi
  echo "== fit $name: $(date)"
  timeout 14400 python autoencode.py fit "$@" \
      --run_dir "runs/r2/$name" > "runs/r2/$name.fit.log" 2>&1
  local rc=$?
  echo "== fit $name done rc=$rc: $(date)"
  [ $rc -eq 0 ] && touch "runs/r2/$name/.done_fit"
  return $rc
}

run_test () {
  local name=$1; shift
  if [ -f "runs/r2/$name/.done_test" ]; then return 0; fi
  echo "== test $name: $(date)"
  timeout 3600 python autoencode.py test "$@" \
      --ckpt_path "runs/r2/$name/ckpt/last" \
      --run_dir "runs/r2/$name" > "runs/r2/$name.test.log" 2>&1 \
    && touch "runs/r2/$name/.done_test"
}

MID="--config cfg/ae/synthetic-mid.yaml"

# ---- Stage 1: GOLF-ff long run --------------------------------------------
run_fit golf_ff $MID --model cfg/ae/decoder/golf.yaml \
    trainer.max_steps=5000 trainer.check_val_every_n_steps=1000
run_test golf_ff $MID --model cfg/ae/decoder/golf.yaml

# ---- Stage 2: GOLF-ss finetune from the ff checkpoint ---------------------
run_fit golf_ss $MID --model cfg/ae/decoder/golf-precise.yaml \
    trainer.max_steps=8000 trainer.check_val_every_n_steps=1000 \
    optimizer.init_args.lr=0.00002 \
    model.init_args.coef_smooth_weight=1.0 \
    ckpt_params_only=true \
    ckpt_path=runs/r2/golf_ff/ckpt/last
run_test golf_ss $MID --model cfg/ae/decoder/golf-precise.yaml \
    model.init_args.coef_smooth_weight=1.0

# ---- Stage 3: variant table -----------------------------------------------
for v in ddsp golf-v1 nhv mlsa world mlsa-taylor; do
  name="var_${v//-/_}"
  run_fit "$name" $MID --model "cfg/ae/decoder/$v.yaml" \
      trainer.max_steps=1500 trainer.check_val_every_n_steps=500
  run_test "$name" $MID --model "cfg/ae/decoder/$v.yaml"
done

echo "== queue complete: $(date)"
