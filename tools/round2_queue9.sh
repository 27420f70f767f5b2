#!/bin/bash
# Remaining round-2 chip work after the Aug-18 relay outage killed the
# recover queue mid-poll. Skips items already landed (golf-fs zero-shot
# test, bench_quiet, floor probes). Order: cheap parity evidence first,
# open-ended finetune last.
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }

log "polling relay"
until timeout 240 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
  sleep 180
done
log "relay back"
MID="--config cfg/ae/synthetic-mid.yaml"
SMODEL=cfg/ae/decoder/golf-precise-stable.yaml

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
timeout 2400 python /root/repo/tools/synth_profile.py \
    > runs/r2/synth_profile.json 2> runs/r2/synth_profile.err
log "bench rerun"
timeout 2400 python bench.py > runs/r2/bench_quiet2.json 2> runs/r2/bench_quiet2.err

log "stream demo on-chip (ss2 ckpt)"
timeout 2400 python scripts/stream_demo.py $MID --model $SMODEL \
    --ckpt_path runs/r2/golf_ss2/ckpt/last --out runs/r2/stream_demo.wav \
    > runs/r2/stream_demo.json 2> runs/r2/stream_demo.err

SS_BUDGET=$(( 3 * 3600 ))
log "golf_ss2b finetune (budget ${SS_BUDGET}s)"
timeout $SS_BUDGET python autoencode.py fit $MID --model $SMODEL \
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
fi
log "queue9 complete"
