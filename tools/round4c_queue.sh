#!/bin/bash
# Round-4c chip phase: fused-LSTM evidence.
#  1. lstm_probe — flax RNN vs fused at encoder shape, unroll sweep
#  2. train_profile (fused LSTM now active) -> train_profile4.json
#  3. bwd_profile re-run (fused) -> bwd_profile2.json
set -u
cd /root/repo
mkdir -p docs/results_r4
log() { echo "== $* : $(date -u)"; }
snap() {
  local name=$1; shift
  for i in 1 2 3; do
    git add docs/results_r4 && \
      git commit -q -m "round 4 evidence: $name" --only docs/results_r4 \
      && break; sleep 7
  done
  git log --oneline -1
}
wait_relay() {
  until timeout 300 python tools/relay_probe.py >/dev/null 2>&1; do
    log "relay compute still down"; sleep 120
  done
}

log "polling relay"; wait_relay
log "lstm probe"
for i in 1 2 3; do
  timeout 2400 python tools/lstm_probe.py \
      > docs/results_r4/lstm_probe.json \
      2> docs/results_r4/lstm_probe.err && break
  log "lstm probe attempt $i failed (rc=$?)"; wait_relay
done
snap lstm_probe

log "train profile (fused LSTM)"
for i in 1 2 3; do
  timeout 2400 python tools/train_profile.py \
      > docs/results_r4/train_profile4.json \
      2> docs/results_r4/train_profile4.err && break
  log "train profile attempt $i failed (rc=$?)"; wait_relay
done
snap train_profile4

log "bwd profile (fused LSTM)"
for i in 1 2 3; do
  timeout 2400 python tools/bwd_profile.py \
      --out docs/results_r4/bwd_profile2.json \
      2> docs/results_r4/bwd_profile2.err \
      > docs/results_r4/bwd_profile2.out && break
  log "bwd profile attempt $i failed (rc=$?)"; wait_relay
done
snap bwd_profile2
log done
