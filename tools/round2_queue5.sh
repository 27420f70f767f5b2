#!/bin/bash
# Replaces queue3-tail + queue4 after the ss2 wedge (see
# runs/r2/golf_ss2.fit.log: environment stall at ~step 850; and loss
# drifting up under coef_smooth_weight=1.0):
#  1. golf_ss v2b finetune — gentler recipe: lr 5e-6, smooth 0.1,
#     pole cap 0.98, from the golf_ff checkpoint; budget to HARD_END-2400
#  2. test it
#  3. floor probe + synth profile + bench on the then-quiet chip
set -u
cd /root/repo
HARD_END=${HARD_END:?}
log() { echo "== $* : $(date -u)"; }

SS_BUDGET=$(( HARD_END - $(date +%s) - 2400 ))
if [ $SS_BUDGET -gt 1200 ]; then
  log "golf_ss v2b finetune (budget ${SS_BUDGET}s)"
  timeout $SS_BUDGET python autoencode.py fit \
      --config cfg/ae/synthetic-mid.yaml \
      --model cfg/ae/decoder/golf-precise-stable.yaml \
      trainer.max_steps=999999 trainer.check_val_every_n_steps=500 \
      optimizer.init_args.lr=0.000005 \
      model.init_args.coef_smooth_weight=0.1 \
      ckpt_params_only=true \
      ckpt_path=runs/r2/golf_ff/ckpt/last \
      --run_dir runs/r2/golf_ss2b > runs/r2/golf_ss2b.fit.log 2>&1
fi
if [ -e runs/r2/golf_ss2b/ckpt/last ]; then
  log "test golf_ss2b"
  timeout 1800 python autoencode.py test \
      --config cfg/ae/synthetic-mid.yaml \
      --model cfg/ae/decoder/golf-precise-stable.yaml \
      model.init_args.coef_smooth_weight=0.1 \
      --ckpt_path runs/r2/golf_ss2b/ckpt/last \
      --run_dir runs/r2/golf_ss2b > runs/r2/golf_ss2b.test.log 2>&1
fi
log "floor probe"
timeout 3600 python tools/axon_session_probe.py > runs/r2/floor_probe2.log 2>&1
log "synth profile"
timeout 2400 python tools/synth_profile.py > runs/r2/synth_profile.json 2> runs/r2/synth_profile.err
log "bench rerun"
timeout 2400 python bench.py > runs/r2/bench_quiet2.json 2> runs/r2/bench_quiet2.err
log "queue5 complete"
