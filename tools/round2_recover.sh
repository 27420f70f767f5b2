#!/bin/bash
# Relay-recovery watcher: poll until the axon backend initializes, then
# run the consolidated remaining round-2 chip work:
#   ss2b finetune (pole-capped, lr 5e-6, smooth 0.1) -> test
#   -> mlsa-taylor fit/test -> floor probe -> synth profile -> bench
#   -> stream demo -> predict + PESQ + FAD for golf_ff / golf_ss2b
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }

log "polling relay"
until timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
  sleep 300
done
log "relay back"

SS_BUDGET=$(( 4 * 3600 ))
MID="--config cfg/ae/synthetic-mid.yaml"
SMODEL=cfg/ae/decoder/golf-precise-stable.yaml

log "golf_ss2b finetune (budget ${SS_BUDGET}s)"
timeout $SS_BUDGET python autoencode.py fit $MID --model $SMODEL \
    trainer.max_steps=12000 trainer.check_val_every_n_steps=500 \
    optimizer.init_args.lr=0.000005 \
    model.init_args.coef_smooth_weight=0.1 \
    ckpt_params_only=true ckpt_path=runs/r2/golf_ff/ckpt/last \
    --run_dir runs/r2/golf_ss2b > runs/r2/golf_ss2b.fit.log 2>&1
if [ -e runs/r2/golf_ss2b/ckpt/last ]; then
  log "test golf_ss2b"
  timeout 1800 python autoencode.py test $MID --model $SMODEL \
      model.init_args.coef_smooth_weight=0.1 \
      --ckpt_path runs/r2/golf_ss2b/ckpt/last \
      --run_dir runs/r2/golf_ss2b > runs/r2/golf_ss2b.test.log 2>&1
fi

log "fit var_mlsa_taylor"
timeout 3600 python autoencode.py fit $MID \
    --model cfg/ae/decoder/mlsa-taylor.yaml \
    trainer.max_steps=600 trainer.check_val_every_n_steps=300 \
    --run_dir runs/r2/var_mlsa_taylor > runs/r2/var_mlsa_taylor.fit.log 2>&1
[ -e runs/r2/var_mlsa_taylor/ckpt/last ] && \
  timeout 1800 python autoencode.py test $MID \
      --model cfg/ae/decoder/mlsa-taylor.yaml \
      --ckpt_path runs/r2/var_mlsa_taylor/ckpt/last \
      --run_dir runs/r2/var_mlsa_taylor > runs/r2/var_mlsa_taylor.test.log 2>&1

log "floor probe"
timeout 3600 python tools/axon_session_probe.py > runs/r2/floor_probe2.log 2>&1
log "synth profile"
timeout 2400 python tools/synth_profile.py > runs/r2/synth_profile.json 2> runs/r2/synth_profile.err
log "bench rerun"
timeout 2400 python bench.py > runs/r2/bench_quiet2.json 2> runs/r2/bench_quiet2.err

CKPT=runs/r2/golf_ss2b/ckpt/last
[ -e "$CKPT" ] || CKPT=runs/r2/golf_ss2/ckpt/last
log "stream demo on-chip ($CKPT)"
timeout 2400 python scripts/stream_demo.py $MID --model $SMODEL \
    --ckpt_path "$CKPT" --out runs/r2/stream_demo.wav \
    > runs/r2/stream_demo.json 2> runs/r2/stream_demo.err

log "predict golf_ff"
timeout 2400 python autoencode.py predict $MID \
    --model cfg/ae/decoder/golf.yaml \
    --ckpt_path runs/r2/golf_ff/ckpt/last \
    --run_dir runs/r2/golf_ff > runs/r2/golf_ff.predict.log 2>&1
if [ -e runs/r2/golf_ss2b/ckpt/last ]; then
  log "predict golf_ss2b"
  timeout 2400 python autoencode.py predict $MID --model $SMODEL \
      model.init_args.coef_smooth_weight=0.1 \
      --ckpt_path runs/r2/golf_ss2b/ckpt/last \
      --run_dir runs/r2/golf_ss2b > runs/r2/golf_ss2b.predict.log 2>&1
fi
for name in golf_ff golf_ss2b; do
  P=runs/r2/$name/predictions
  [ -d "$P" ] || continue
  log "pesq $name"
  timeout 1200 python eval_pesq.py runs/r2/refs "$P" \
      > runs/r2/$name.pesq.log 2>&1
  log "fad $name"
  timeout 1200 python fad.py runs/r2/refs "$P" \
      > runs/r2/$name.fad.log 2>&1
done
log "recover-queue complete"
