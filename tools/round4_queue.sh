#!/bin/bash
# Round-4 chip queue: sample-wise training diagnosis (VERDICT r3 #4) +
# ring-kernel probe (#10). Rebuilds the golf_ff anchor (round-3 run dirs
# were wiped with the image), then runs two GENTLER sample-wise finetune
# variants against the round-3 recipe that regressed (lr=5e-6/clip=0.5/
# cap=0.98 drifted from loss 3.11 -> 3.9 with 1e4 grad-norm spikes):
#   A "gentle": lr=1e-6, clip=0.1, cap 0.98   (smaller, harder-clipped steps)
#   B "cap95" : lr=5e-6, clip=0.5, cap 0.95   (bounded adjoint amplification)
# The variant with the best final val_loss is extended to 10k steps and
# fully evaluated (test MCD/MSS + predict + PESQ + FAD); the zero-shot
# sample-wise row (the reference protocol) is re-measured for the table.
# Every milestone snaps into docs/results_r4/ and commits immediately.
set -u
cd /root/repo
mkdir -p runs/r4 docs/results_r4
log() { echo "== $* : $(date -u)"; }

snap() {  # snap <name> <files...>
  local name=$1; shift
  for f in "$@"; do
    [ -e "$f" ] && cp -r "$f" "docs/results_r4/$(basename "$f")"
  done
  for i in 1 2 3; do
    if git add docs/results_r4 && \
       git commit -q -m "round 4 evidence: $name" --only docs/results_r4
    then break; fi
    sleep 7
  done
  git log --oneline -1
}

wait_relay() {
  # gate on actual COMPUTE liveness: the relay's metadata service can
  # answer jax.devices() while its compile/execute service is down
  until timeout 300 python tools/relay_probe.py >/dev/null 2>&1; do
    log "relay compute still down"
    sleep 120
  done
}

try_run() {  # try_run <run_dir_to_clean_on_retry> <cmd...>
  # TPU relay faults (ABORTED/FAILED_PRECONDITION) can kill a step at
  # its first dispatch; retry with a relay poll between attempts and a
  # clean run_dir (partial state is cheaper to redo than to debug).
  local rd=$1; shift
  for i in $(seq 1 12); do
    "$@" && return 0
    log "attempt $i failed: $*"
    [ -n "$rd" ] && rm -rf "$rd"
    sleep 60; wait_relay
  done
  return 1
}

log "polling relay"; wait_relay; log "relay up"
MID="--config cfg/ae/synthetic-mid.yaml"

# ---- 0. ring-kernel probe (VERDICT #10) -----------------------------------
if [ ! -e docs/results_r4/ring_probe.json ]; then
  log "ring probe"
  timeout 1800 python tools/ring_probe.py \
      > docs/results_r4/ring_probe.json 2> docs/results_r4/ring_probe.err
  snap ring_probe docs/results_r4/ring_probe.json
fi

# ---- 1. golf_ff anchor ------------------------------------------------------
if [ ! -e runs/r4/golf_ff/ckpt/last ]; then
  log "fit golf_ff (4.7k steps)"
  try_run runs/r4/golf_ff \
      timeout 9000 python autoencode.py fit $MID \
      --model cfg/ae/decoder/golf.yaml \
      trainer.max_steps=4700 trainer.check_val_every_n_steps=500 \
      --run_dir runs/r4/golf_ff >> runs/r4/golf_ff.fit.log 2>&1
fi
[ -e runs/r4/golf_ff/ckpt/last ] || { log "golf_ff FAILED, abort"; exit 1; }
if [ ! -e runs/r4/golf_ff.test.log ]; then
  log "test golf_ff"
  timeout 1800 python autoencode.py test $MID \
      --model cfg/ae/decoder/golf.yaml \
      --ckpt_path runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/golf_ff > runs/r4/golf_ff.test.log 2>&1
  snap golf_ff runs/r4/golf_ff.fit.log runs/r4/golf_ff.test.log
fi

# ---- 2. zero-shot sample-wise (reference protocol) row ----------------------
if [ ! -e runs/r4/golf_fs.test.log ]; then
  log "golf_fs zero-shot"
  timeout 2400 python autoencode.py test $MID \
      --model cfg/ae/decoder/golf-precise-stable.yaml \
      ckpt_params_only=true \
      --ckpt_path runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/golf_fs > runs/r4/golf_fs.test.log 2>&1
  snap golf_fs runs/r4/golf_fs.test.log
fi

# ---- 3. ss finetune variants (3500 steps each) ------------------------------
if [ ! -e runs/r4/ss_gentle/ckpt/last ]; then
  log "ss variant A: gentle (lr=1e-6 clip=0.1 cap=0.98)"
  try_run runs/r4/ss_gentle \
      timeout 6000 python autoencode.py fit $MID \
      --model cfg/ae/decoder/golf-precise-stable.yaml \
      trainer.max_steps=3500 trainer.check_val_every_n_steps=500 \
      trainer.gradient_clip_val=0.1 \
      optimizer.init_args.lr=0.000001 \
      model.init_args.coef_smooth_weight=0.1 \
      ckpt_params_only=true ckpt_path=runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/ss_gentle >> runs/r4/ss_gentle.fit.log 2>&1
  snap ss_gentle runs/r4/ss_gentle.fit.log
fi
if [ ! -e runs/r4/ss_cap95/ckpt/last ]; then
  log "ss variant B: cap95 (lr=5e-6 clip=0.5 cap=0.95)"
  try_run runs/r4/ss_cap95 \
      timeout 6000 python autoencode.py fit $MID \
      --model cfg/ae/decoder/golf-precise-stable95.yaml \
      trainer.max_steps=3500 trainer.check_val_every_n_steps=500 \
      optimizer.init_args.lr=0.000005 \
      model.init_args.coef_smooth_weight=0.1 \
      ckpt_params_only=true ckpt_path=runs/r4/golf_ff/ckpt/last \
      --run_dir runs/r4/ss_cap95 >> runs/r4/ss_cap95.fit.log 2>&1
  snap ss_cap95 runs/r4/ss_cap95.fit.log
fi

# ---- 4. pick winner by final val_loss, extend to 10k ------------------------
lastval() { grep -o 'val_loss=[0-9.]*' "$1" | tail -1 | cut -d= -f2; }
VA=$(lastval runs/r4/ss_gentle.fit.log); VA=${VA:-99}
VB=$(lastval runs/r4/ss_cap95.fit.log); VB=${VB:-99}
log "variant vals: gentle=$VA cap95=$VB"
if python -c "import sys; sys.exit(0 if float('$VA') <= float('$VB') else 1)"
then WIN=ss_gentle; WMODEL=cfg/ae/decoder/golf-precise-stable.yaml
     WEXTRA="trainer.gradient_clip_val=0.1 optimizer.init_args.lr=0.000001"
else WIN=ss_cap95; WMODEL=cfg/ae/decoder/golf-precise-stable95.yaml
     WEXTRA="optimizer.init_args.lr=0.000005"
fi
log "winner: $WIN"
if [ ! -e runs/r4/ss_final/ckpt/last ]; then
  log "extend $WIN to 10k steps"
  try_run runs/r4/ss_final \
      timeout 9000 python autoencode.py fit $MID --model $WMODEL \
      trainer.max_steps=10000 trainer.check_val_every_n_steps=500 \
      $WEXTRA model.init_args.coef_smooth_weight=0.1 \
      ckpt_path=runs/r4/$WIN/ckpt/last \
      --run_dir runs/r4/ss_final >> runs/r4/ss_final.fit.log 2>&1
  snap ss_final runs/r4/ss_final.fit.log
fi

# ---- 5. full eval of the final ss model + the anchor ------------------------
if [ ! -d runs/r4/refs ]; then
  log "dump refs"
  timeout 900 python tools/dump_refs.py cfg/ae/synthetic-mid.yaml \
      runs/r4/refs > runs/r4/refs.log 2>&1
fi
if [ -e runs/r4/ss_final/ckpt/last ] && [ ! -e runs/r4/ss_final.test.log ]
then
  log "test+predict ss_final"
  timeout 1800 python autoencode.py test $MID --model $WMODEL \
      --ckpt_path runs/r4/ss_final/ckpt/last \
      --run_dir runs/r4/ss_final > runs/r4/ss_final.test.log 2>&1
  timeout 2400 python autoencode.py predict $MID --model $WMODEL \
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
log "round4_queue done"
