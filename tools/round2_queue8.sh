#!/bin/bash
# After queue7: quality-parity evidence on the trained checkpoints —
# predict + real-PESQ (native P.862 impl) + FAD (log-mel embedder,
# labeled) for golf_ff and the sample-wise golf_ss2b.
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }
log "waiting for queue7"
while pgrep -f "round2_queue7.sh" >/dev/null 2>&1; do sleep 120; done
log "queue7 done"
MID="--config cfg/ae/synthetic-mid.yaml"

log "predict golf_ff"
timeout 2400 python autoencode.py predict $MID \
    --model cfg/ae/decoder/golf.yaml \
    --ckpt_path runs/r2/golf_ff/ckpt/last \
    --run_dir runs/r2/golf_ff > runs/r2/golf_ff.predict.log 2>&1

CKPT=runs/r2/golf_ss2b/ckpt/last
MODEL=cfg/ae/decoder/golf-precise-stable.yaml
if [ -e "$CKPT" ]; then
  log "predict golf_ss2b"
  timeout 2400 python autoencode.py predict $MID --model $MODEL \
      model.init_args.coef_smooth_weight=0.1 \
      --ckpt_path "$CKPT" \
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
log "queue8 complete"
