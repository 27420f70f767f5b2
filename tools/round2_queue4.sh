#!/bin/bash
# After queue3 (golf_ss2 finetune + test): quiet-chip measurements.
#  1. axon session floor probe (dispatch-floor bimodality evidence)
#  2. per-stage synthesis profile (device-time attribution)
#  3. bench.py rerun
set -u
cd /root/repo
log() { echo "== $* : $(date -u)"; }
log "waiting for queue3"
while pgrep -f "round2_queue3.sh" >/dev/null 2>&1; do sleep 120; done
log "queue3 done"
sleep 30
log "floor probe"
timeout 3600 python tools/axon_session_probe.py > runs/r2/floor_probe2.log 2>&1
log "synth profile"
timeout 2400 python tools/synth_profile.py > runs/r2/synth_profile.json 2> runs/r2/synth_profile.err
log "bench rerun"
timeout 2400 python bench.py > runs/r2/bench_quiet2.json 2> runs/r2/bench_quiet2.err
log "queue4 complete"
