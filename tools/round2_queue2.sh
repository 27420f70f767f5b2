#!/bin/bash
# Revised round-2 queue (replaces the tail of round2_queue.sh after the
# golf_ff stage): fits the remaining round budget.
#
# Stage 0 (chip exclusive): golf_ff test, allpole dispatch sweep (quick),
#           training profile fp32 + bf16 (MFU/breakdown evidence).
# Stage 1: GOLF-ss finetune from the golf_ff checkpoint runs in the
#           BACKGROUND until the deadline (convergence evidence: as many
#           steps as the budget allows, lr 2e-5 + coefficient-smoothness
#           regularizer, reference ff->ss playbook README.md:92-94)
#           while the remaining decoder variants train serially in the
#           foreground (600 steps each + test) for the variant table.
# Stage 2: GOLF-ss test.
#
# HARD_END: unix epoch after which nothing new starts (default: computed
# by the caller). Two fits share the chip; host RAM fits two processes.
set -u
cd /root/repo
HARD_END=${HARD_END:?set HARD_END epoch}
MID="--config cfg/ae/synthetic-mid.yaml"

left() { echo $(( HARD_END - $(date +%s) )); }
log() { echo "== $* : $(date -u)"; }

run_test () {
  local name=$1; shift
  [ -f "runs/r2/$name/.done_test" ] && return 0
  [ -e "runs/r2/$name/ckpt/last" ] || { log "$name: no ckpt, skip test"; return 1; }
  log "test $name"
  timeout 1200 python autoencode.py test "$@" \
      --ckpt_path "runs/r2/$name/ckpt/last" \
      --run_dir "runs/r2/$name" > "runs/r2/$name.test.log" 2>&1 \
    && touch "runs/r2/$name/.done_test"
}

# ---- Stage 0: chip-exclusive measurements ---------------------------------
run_test golf_ff $MID --model cfg/ae/decoder/golf.yaml

if [ ! -f golf_tpu/ops/allpole_dispatch.json ]; then
  log "allpole sweep (quick)"
  timeout 1800 python tools/allpole_sweep.py --quick \
      > runs/r2/sweep_quick.log 2>&1
fi
if [ ! -f runs/r2/profile_fp32.log ]; then
  log "train profile fp32"
  timeout 1500 python tools/train_profile.py --batch 32 \
      > runs/r2/profile_fp32.log 2>&1
fi
if [ ! -f runs/r2/profile_bf16.log ]; then
  log "train profile bf16"
  timeout 1500 python tools/train_profile.py --batch 32 \
      --compute_dtype bfloat16 > runs/r2/profile_bf16.log 2>&1
fi

# ---- Stage 1: ss finetune (background) + variant table (foreground) -------
SS_BUDGET=$(( $(left) - 1500 ))
if [ $SS_BUDGET -gt 900 ] && [ ! -f runs/r2/golf_ss/.done_fit ]; then
  log "golf_ss finetune launch (budget ${SS_BUDGET}s)"
  timeout $SS_BUDGET python autoencode.py fit $MID \
      --model cfg/ae/decoder/golf-precise.yaml \
      trainer.max_steps=999999 trainer.check_val_every_n_steps=500 \
      optimizer.init_args.lr=0.00002 \
      model.init_args.coef_smooth_weight=1.0 \
      ckpt_params_only=true \
      ckpt_path=runs/r2/golf_ff/ckpt/last \
      --run_dir runs/r2/golf_ss > runs/r2/golf_ss.fit.log 2>&1 &
  SS_PID=$!
else
  SS_PID=""
fi

for v in ddsp golf-v1 nhv mlsa world mlsa-taylor; do
  name="var_${v//-/_}"
  [ -f "runs/r2/$name/.done_fit" ] && continue
  if [ $(left) -lt 2400 ]; then log "deadline: skip $name"; continue; fi
  log "fit $name"
  timeout 3000 python autoencode.py fit $MID \
      --model "cfg/ae/decoder/$v.yaml" \
      trainer.max_steps=600 trainer.check_val_every_n_steps=300 \
      --run_dir "runs/r2/$name" > "runs/r2/$name.fit.log" 2>&1 \
    && touch "runs/r2/$name/.done_fit"
  run_test "$name" $MID --model "cfg/ae/decoder/$v.yaml"
done

# ---- Stage 2: wait out the ss run, then test it ----------------------------
if [ -n "$SS_PID" ]; then
  log "waiting for golf_ss (pid $SS_PID)"
  wait $SS_PID
fi
run_test golf_ss $MID --model cfg/ae/decoder/golf-precise.yaml \
    model.init_args.coef_smooth_weight=1.0
log "queue2 complete"
