#!/bin/bash
# Round-4 on-chip evidence queue, phase 1: serving-chain attribution and
# the kernel-variant probes the round-3 verdict flagged as uncommitted.
# Writes into docs/results_r4/ (no git ops; the builder commits).
set -u
cd "$(dirname "$0")/.."
OUT=docs/results_r4
mkdir -p "$OUT"

run() { # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 1200 "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "rc=$? ($name)"
}

run synth_profile python tools/synth_profile.py
run lookup_probe python tools/lookup_probe.py
run fft_size_probe python tools/fft_size_probe.py
run source_profile python tools/source_profile3.py
echo "=== round4_chip phase1 done ==="
