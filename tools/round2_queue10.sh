#!/bin/bash
# Round-2 recovery queue (session restart wiped the untracked runs/ tree,
# losing every checkpoint). Regenerates the chip evidence from scratch:
#  1. golf_ff 4.7k-step fit + test (anchor checkpoint for everything else)
#  2. golf-fs zero-shot test (reference GOLF-ss protocol: ff ckpt +
#     sample-wise filter at eval, reference README.md:94)
#  3. var_mlsa_taylor fit/test (last missing variant-table row)
#  4. refs dump + predict + PESQ(native P.862) + FAD for golf_ff
#  5. per-stage synthesis profile
#  6. golf_ss2b pole-capped sample-wise finetune (lr 5e-6, smooth 0.1)
#     + test/predict/PESQ/FAD
#  7. stream demo on the ss2b checkpoint
set -u
cd /root/repo
mkdir -p runs/r2
log() { echo "== $* : $(date -u)"; }

log "polling relay"
until timeout 240 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
  sleep 180
done
log "relay up"
MID="--config cfg/ae/synthetic-mid.yaml"
SMODEL=cfg/ae/decoder/golf-precise-stable.yaml

if [ ! -e runs/r2/golf_ff/ckpt/last ]; then
  log "fit golf_ff (4.7k steps)"
  timeout 9000 python autoencode.py fit $MID \
      --model cfg/ae/decoder/golf.yaml \
      trainer.max_steps=4700 trainer.check_val_every_n_steps=500 \
      --run_dir runs/r2/golf_ff > runs/r2/golf_ff.fit.log 2>&1
fi
[ -e runs/r2/golf_ff/ckpt/last ] || { log "golf_ff fit FAILED, abort"; exit 1; }

log "test golf_ff"
timeout 1800 python autoencode.py test $MID \
    --model cfg/ae/decoder/golf.yaml \
    --ckpt_path runs/r2/golf_ff/ckpt/last \
    --run_dir runs/r2/golf_ff > runs/r2/golf_ff.test.log 2>&1

log "golf-fs zero-shot test (ff ckpt + sample-wise filter)"
timeout 2400 python autoencode.py test $MID \
    --model cfg/ae/decoder/golf.yaml \
    'model.init_args.decoder.init_args.end_filter={class_path: models.filters.LTVMinimumPhaseFilterPrecise, init_args: {lpc_order: 22, lpc_parameterisation: rc2lpc}}' \
    ckpt_params_only=true \
    --ckpt_path runs/r2/golf_ff/ckpt/last \
    --run_dir runs/r2/golf_fs > runs/r2/golf_fs.test.log 2>&1

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

log "dump refs"
timeout 900 python tools/dump_refs.py cfg/ae/synthetic-mid.yaml runs/r2/refs \
    > runs/r2/refs.log 2>&1

log "predict golf_ff"
timeout 2400 python autoencode.py predict $MID \
    --model cfg/ae/decoder/golf.yaml \
    --ckpt_path runs/r2/golf_ff/ckpt/last \
    --run_dir runs/r2/golf_ff > runs/r2/golf_ff.predict.log 2>&1
if [ -d runs/r2/golf_ff/predictions ]; then
  log "pesq+fad golf_ff"
  timeout 1200 python eval_pesq.py runs/r2/refs runs/r2/golf_ff/predictions \
      > runs/r2/golf_ff.pesq.log 2>&1
  timeout 1200 python fad.py runs/r2/refs runs/r2/golf_ff/predictions \
      > runs/r2/golf_ff.fad.log 2>&1
fi

log "synth profile"
timeout 2400 python tools/synth_profile.py \
    > runs/r2/synth_profile.json 2> runs/r2/synth_profile.err

log "golf_ss2b finetune (2.5h budget)"
timeout 9000 python autoencode.py fit $MID --model $SMODEL \
    trainer.max_steps=10000 trainer.check_val_every_n_steps=500 \
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
  log "predict golf_ss2b"
  timeout 2400 python autoencode.py predict $MID --model $SMODEL \
      model.init_args.coef_smooth_weight=0.1 \
      --ckpt_path runs/r2/golf_ss2b/ckpt/last \
      --run_dir runs/r2/golf_ss2b > runs/r2/golf_ss2b.predict.log 2>&1
  if [ -d runs/r2/golf_ss2b/predictions ]; then
    timeout 1200 python eval_pesq.py runs/r2/refs runs/r2/golf_ss2b/predictions \
        > runs/r2/golf_ss2b.pesq.log 2>&1
    timeout 1200 python fad.py runs/r2/refs runs/r2/golf_ss2b/predictions \
        > runs/r2/golf_ss2b.fad.log 2>&1
  fi
  log "stream demo (ss2b ckpt)"
  timeout 2400 python scripts/stream_demo.py $MID --model $SMODEL \
      --ckpt_path runs/r2/golf_ss2b/ckpt/last --out runs/r2/stream_demo.wav \
      > runs/r2/stream_demo.json 2> runs/r2/stream_demo.err
fi
log "queue10 complete"
