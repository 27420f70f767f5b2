#!/bin/bash
# Round-4b chip phase: backward-pass attribution (tools/bwd_profile.py)
# at the training shape, feeding the bwd-optimization work.
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

log "polling relay"; wait_relay; log "relay up"
log "bwd profile"
for i in 1 2 3; do
  timeout 2400 python tools/bwd_profile.py \
      --out docs/results_r4/bwd_profile.json \
      2> docs/results_r4/bwd_profile.err \
      > docs/results_r4/bwd_profile.out && break
  log "bwd profile attempt $i failed (rc=$?)"; wait_relay
done
snap bwd_profile
log done
