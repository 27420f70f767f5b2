#!/bin/bash
# After queue6: on-chip streaming-latency measurement.
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }
log "waiting for queue6"
while pgrep -f "round2_queue6.sh" >/dev/null 2>&1; do sleep 120; done
log "queue6 done"
CKPT=runs/r2/golf_ss2b/ckpt/last
[ -e "$CKPT" ] || CKPT=runs/r2/golf_ss2/ckpt/last
log "stream demo on-chip ($CKPT)"
timeout 2400 python scripts/stream_demo.py \
    --config cfg/ae/synthetic-mid.yaml \
    --model cfg/ae/decoder/golf-precise-stable.yaml \
    --ckpt_path "$CKPT" --out runs/r2/stream_demo.wav \
    > runs/r2/stream_demo.json 2> runs/r2/stream_demo.err
log "queue7 complete"
