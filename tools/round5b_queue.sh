#!/bin/bash
# Round-5b chip queue — runs AFTER tools/round5_queue.sh completes.
# Captures evidence for the round-5 backward-pass kernels (two-level
# wavetable lookup adjoint + wrapped_cumsum custom VJP):
#   - bwd_stage2: per-stage decode backward attribution (was: harm_source
#     219 of 226 ms, docs/results_r5/bwd_stage.json)
#   - lookup_probe2: new lookup kernel vs XLA gather at the bench shape
set -u
cd /root/repo
mkdir -p docs/results_r5
log() { echo "== $* : $(date -u)"; }
snap() {
  local name=$1; shift
  local got=()
  for f in "$@"; do
    [ -s "$f" ] && got+=("$f")
  done
  [ ${#got[@]} -eq 0 ] && { log "snap $name: nothing to commit"; return 1; }
  for i in 1 2 3; do
    git add "${got[@]}" && \
      git commit -q -m "round 5 evidence: $name" --only "${got[@]}" && break
    sleep 7
  done
  git log --oneline -1
}
wait_relay() {
  until timeout 300 python tools/relay_probe.py >/dev/null 2>&1; do
    log "relay compute still down"; sleep 120
  done
}

if [ ! -e docs/results_r5/bwd_stage2.json ]; then
  log "bwd_stage2 (post two-level lookup adjoint)"
  wait_relay
  timeout 4000 python tools/bwd_stage_profile.py \
    --out docs/results_r5/bwd_stage2.json \
    2> docs/results_r5/bwd_stage2.err || true
  snap bwd_stage2 docs/results_r5/bwd_stage2.json
fi

if [ ! -e docs/results_r5/lookup_probe2.json ]; then
  log "lookup_probe2 (two-level kernel)"
  wait_relay
  timeout 3600 python tools/lookup_probe.py \
    > docs/results_r5/lookup_probe2.json \
    2> docs/results_r5/lookup_probe2.err || true
  snap lookup_probe2 docs/results_r5/lookup_probe2.json
fi

log "round5b done"
