#!/bin/bash
# Round-4 final chip phase: decide the Bluestein default, re-profile the
# serving chain after the FFT-size change, record an on-chip test_rtf
# run (relay-honest protocol evidence), and a final bench capture.
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

if [ ! -s docs/results_r4/bluestein_probe.json ]; then
  log "bluestein probe"
  timeout 1500 python tools/bluestein_probe.py \
      > docs/results_r4/bluestein_probe.json \
      2> docs/results_r4/bluestein_probe.err
  snap bluestein_probe
fi

log "synth profile (post fft-size change)"
timeout 1500 python tools/synth_profile.py \
    > docs/results_r4/synth_profile2.json \
    2> docs/results_r4/synth_profile2.err
snap synth_profile2

if [ -e runs/r4/golf_ff/config.yaml ]; then
  log "test_rtf on-chip (golf_ff run config)"
  timeout 1500 python test_rtf.py --config runs/r4/golf_ff/config.yaml \
      --ckpt runs/r4/golf_ff/ckpt/last \
      > docs/results_r4/test_rtf.log 2>&1
  snap test_rtf
fi

log "final bench capture"
timeout 2400 python bench.py > docs/results_r4/bench_r4.json \
    2> docs/results_r4/bench_r4.err
echo "bench rc=$?" >> docs/results_r4/bench_r4.err
snap bench_r4
log "round4_final done"
