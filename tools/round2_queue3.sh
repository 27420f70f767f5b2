#!/bin/bash
# Post-queue2 chip schedule:
#  0. wait for queue2 to finish (chip free)
#  1. axon session floor probe (dispatch-floor evidence across sessions)
#  2. bench.py once (current headline numbers on a quiet chip)
#  3. GOLF-ss finetune v2: pole-radius-capped recipe (golf-precise-stable),
#     lr 1e-5, coef smoothness 1.0, from the golf_ff checkpoint, until
#     HARD_END - 1800; then test it.
set -u
cd /root/repo
HARD_END=${HARD_END:?set HARD_END epoch}
log() { echo "== $* : $(date -u)"; }

log "waiting for queue2"
while pgrep -f "round2_queue2.sh" >/dev/null 2>&1; do sleep 60; done
log "queue2 done"

log "session floor probe"
timeout 2400 python tools/axon_session_probe.py > runs/r2/floor_probe.log 2>&1

log "bench (quiet chip)"
timeout 2400 python bench.py > runs/r2/bench_quiet.json 2> runs/r2/bench_quiet.err

log "synth per-stage profile"
timeout 2400 python tools/synth_profile.py > runs/r2/synth_profile.json 2> runs/r2/synth_profile.err

SS_BUDGET=$(( HARD_END - $(date +%s) - 1800 ))
if [ $SS_BUDGET -gt 1200 ]; then
  log "golf_ss v2 finetune (budget ${SS_BUDGET}s)"
  timeout $SS_BUDGET python autoencode.py fit \
      --config cfg/ae/synthetic-mid.yaml \
      --model cfg/ae/decoder/golf-precise-stable.yaml \
      trainer.max_steps=999999 trainer.check_val_every_n_steps=500 \
      optimizer.init_args.lr=0.00001 \
      model.init_args.coef_smooth_weight=1.0 \
      ckpt_params_only=true \
      ckpt_path=runs/r2/golf_ff/ckpt/last \
      --run_dir runs/r2/golf_ss2 > runs/r2/golf_ss2.fit.log 2>&1
fi
if [ -e runs/r2/golf_ss2/ckpt/last ]; then
  log "test golf_ss2"
  timeout 1800 python autoencode.py test \
      --config cfg/ae/synthetic-mid.yaml \
      --model cfg/ae/decoder/golf-precise-stable.yaml \
      model.init_args.coef_smooth_weight=1.0 \
      --ckpt_path runs/r2/golf_ss2/ckpt/last \
      --run_dir runs/r2/golf_ss2 > runs/r2/golf_ss2.test.log 2>&1
fi
log "queue3 complete"
