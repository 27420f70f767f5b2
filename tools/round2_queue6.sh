#!/bin/bash
# After queue5: the variant-table stragglers on the quiet chip.
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }
log "waiting for queue5"
while pgrep -f "round2_queue5.sh" >/dev/null 2>&1; do sleep 120; done
log "queue5 done"
MID="--config cfg/ae/synthetic-mid.yaml"
log "fit var_mlsa_taylor"
timeout 3600 python autoencode.py fit $MID \
    --model cfg/ae/decoder/mlsa-taylor.yaml \
    trainer.max_steps=600 trainer.check_val_every_n_steps=300 \
    --run_dir runs/r2/var_mlsa_taylor > runs/r2/var_mlsa_taylor.fit.log 2>&1
if [ -e runs/r2/var_mlsa_taylor/ckpt/last ]; then
  log "test var_mlsa_taylor"
  timeout 1800 python autoencode.py test $MID \
      --model cfg/ae/decoder/mlsa-taylor.yaml \
      --ckpt_path runs/r2/var_mlsa_taylor/ckpt/last \
      --run_dir runs/r2/var_mlsa_taylor > runs/r2/var_mlsa_taylor.test.log 2>&1
fi
log "queue6 complete"
