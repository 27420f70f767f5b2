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

# Recovery pass A: re-run any variant FIT the main queue abandoned (its
# 3 attempts can all burn on relay flaps mid-run; blocks are single-shot
# per queue pass). Up to 6 attempts, relay-gated each time.
MID="--config cfg/ae/synthetic-mid.yaml"
for v in golf ddsp nhv world golf-v1 mlsa mlsa-taylor; do
  name=${v//-/_}
  if [ ! -e runs/r5/var_$name/ckpt/last ]; then
    log "recover fit $v"
    for i in 1 2 3 4 5 6; do
      wait_relay
      timeout 10000 python autoencode.py fit $MID \
        --model cfg/ae/decoder/$v.yaml \
        trainer.max_steps=6000 trainer.check_val_every_n_steps=500 \
        trainer.early_stop_patience=30 \
        --run_dir runs/r5/var_$name >> runs/r5/var_$name.fit.log 2>&1 \
        && break
      log "recover fit $v attempt $i failed (rc=$?)"
    done
  fi
  if [ -e runs/r5/var_$name/ckpt/last ] && \
     [ ! -e runs/r5/var_$name.test.log ]; then
    log "recover missing test $v"
    wait_relay
    timeout 2400 python autoencode.py test $MID \
      --model cfg/ae/decoder/$v.yaml \
      --ckpt_path runs/r5/var_$name/ckpt/last \
      --run_dir runs/r5/var_$name > runs/r5/var_$name.test.log 2>&1
    cp runs/r5/var_$name/metrics.jsonl runs/r5/var_$name.metrics.jsonl \
      2>/dev/null
    snap var_$name runs/r5/var_$name.fit.log runs/r5/var_$name.test.log \
      runs/r5/var_$name.metrics.jsonl
  fi
done

# Recovery pass: re-run any variant test row whose log exists but holds
# no final avg_* JSON line (relay died mid-test; the main queue's
# test blocks are single-shot and would otherwise skip them forever).
MID="--config cfg/ae/synthetic-mid.yaml"
for v in golf ddsp nhv world golf-v1 mlsa mlsa-taylor; do
  name=${v//-/_}
  if [ -e runs/r5/var_$name/ckpt/last ] && \
     [ -e runs/r5/var_$name.test.log ] && \
     ! grep -q '"avg_mss' runs/r5/var_$name.test.log; then
    log "recover test $v (no avg_mss in log)"
    wait_relay
    timeout 2400 python autoencode.py test $MID \
      --model cfg/ae/decoder/$v.yaml \
      --ckpt_path runs/r5/var_$name/ckpt/last \
      --run_dir runs/r5/var_$name > runs/r5/var_$name.test.log 2>&1
    cp runs/r5/var_$name/metrics.jsonl runs/r5/var_$name.metrics.jsonl \
      2>/dev/null
    grep -q '"avg_mss' runs/r5/var_$name.test.log && \
      snap var_$name runs/r5/var_$name.fit.log runs/r5/var_$name.test.log \
        runs/r5/var_$name.metrics.jsonl
  fi
done

# bf16 encoder A/B: same recipe 800 steps, fp32 vs bf16 conv+LSTM compute
# (the carry stays fp32 — models/rnn.py). If the loss curves track, the
# bf16 knob is a safe ~x speedup on the encoder half of the step.
for dt in fp32 bf16; do
  if [ ! -e runs/r5/ab_$dt.fit.log.done ]; then
    OVR=""
    [ $dt = bf16 ] && OVR="model.init_args.encoder_init_args.compute_dtype=bfloat16"
    log "bf16 A/B: $dt"
    wait_relay
    timeout 4000 python autoencode.py fit --config cfg/ae/synthetic-mid.yaml \
      --model cfg/ae/decoder/golf.yaml \
      trainer.max_steps=800 trainer.check_val_every_n_steps=400 $OVR \
      --run_dir runs/r5/ab_$dt >> runs/r5/ab_$dt.fit.log 2>&1 \
      && touch runs/r5/ab_$dt.fit.log.done
    snap ab_$dt runs/r5/ab_$dt.fit.log
  fi
done

# PESQ + FAD rows for the top-3 variants by test MSS (VERDICT r4 #2:
# "full test rows + PESQ/FAD for the top 3").
if [ ! -d runs/r5/refs ]; then
  log "dump refs"
  timeout 900 python tools/dump_refs.py cfg/ae/synthetic-mid.yaml \
      runs/r5/refs > runs/r5/refs.log 2>&1
fi
TOP3=$(python - <<'PYEOF'
import json, os
rows = []
for v in ["golf", "ddsp", "nhv", "world", "golf_v1", "mlsa", "mlsa_taylor"]:
    p = f"runs/r5/var_{v}.test.log"
    if not os.path.exists(p):
        continue
    for line in open(p):
        line = line.strip()
        if line.startswith("{") and "avg_mss" in line:
            rows.append((json.loads(line)["avg_mss_loss"], v))
rows.sort()
print(" ".join(v for _, v in rows[:3]))
PYEOF
)
log "top3 variants: $TOP3"
for name in $TOP3; do
  v=${name//_/-}
  if [ -e runs/r5/var_$name/ckpt/last ] && \
     [ ! -e runs/r5/var_$name.pesq.log ]; then
    log "predict+pesq+fad $name"
    wait_relay
    timeout 2400 python autoencode.py predict $MID \
      --model cfg/ae/decoder/$v.yaml \
      --ckpt_path runs/r5/var_$name/ckpt/last \
      --run_dir runs/r5/var_$name > runs/r5/var_$name.predict.log 2>&1
    if [ -d runs/r5/var_$name/predictions ]; then
      timeout 1200 python eval_pesq.py runs/r5/refs \
          runs/r5/var_$name/predictions > runs/r5/var_$name.pesq.log 2>&1
      timeout 1200 python fad.py runs/r5/refs \
          runs/r5/var_$name/predictions > runs/r5/var_$name.fad.log 2>&1
    fi
    snap ${name}_eval runs/r5/var_$name.pesq.log runs/r5/var_$name.fad.log \
      runs/r5/var_$name.predict.log
  fi
done

log "round5b done"
