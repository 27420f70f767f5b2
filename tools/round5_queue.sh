#!/bin/bash
# Round-5 chip queue — VERDICT r4 "next round" items needing training time:
#  #2 variant battery to plateau (ddsp/nhv/world/golf-v1/mlsa/mlsa-taylor,
#     6k-step cap + early-stop patience, full test rows)
#  #3 learned-f0 HPN vocoder recipe fix (stable lr/batch, 6k steps)
#  #4 LPCNet >=10k steps (amsgrad + reference LR decay), avg_ar_mss at
#     4k and 10k checkpoints
#  #9 ss-SGD transfer check (second corpus finetune + from-scratch ss)
# Evidence lands in docs/results_r5/ + runs/r5/. Each block is idempotent
# (skipped if its artifact exists); snap() only commits files that exist
# and were freshly produced (ADVICE r4: no stale evidence under an
# evidence label).
set -u
cd /root/repo
mkdir -p docs/results_r5 runs/r5
log() { echo "== $* : $(date -u)"; }
snap() {
  # snap NAME file...  — copy existing files into docs/results_r5 and
  # commit only those; skip entirely when none exist (failed block).
  local name=$1; shift
  local got=()
  for f in "$@"; do
    [ -s "$f" ] && cp "$f" docs/results_r5/ && got+=("docs/results_r5/$(basename "$f")")
  done
  [ ${#got[@]} -eq 0 ] && { log "snap $name: nothing to commit (all attempts failed)"; return 1; }
  for i in 1 2 3; do
    git add "${got[@]}" && \
      git commit -q -m "round 5 evidence: $name" --only "${got[@]}" \
      && break; sleep 7
  done
  git log --oneline -1
}
wait_relay() {
  until timeout 300 python tools/relay_probe.py >/dev/null 2>&1; do
    log "relay compute still down"; sleep 120
  done
}
MID="--config cfg/ae/synthetic-mid.yaml"

log "polling relay"; wait_relay; log "relay up"

# ---- 1. variant battery to plateau (VERDICT #2) ----------------------------
# 6000-step cap, early stop after 30 logged steps (1500 steps) without a
# new best train loss; golf-ff re-anchored first (also validates the r5
# training-path speedups end to end).
for v in golf ddsp nhv world golf-v1 mlsa mlsa-taylor; do
  name=${v//-/_}
  if [ ! -e runs/r5/var_$name/ckpt/last ]; then
    log "fit $v (6k cap, early-stop 30)"
    for i in 1 2 3; do
      wait_relay
      timeout 10000 python autoencode.py fit $MID \
        --model cfg/ae/decoder/$v.yaml \
        trainer.max_steps=6000 trainer.check_val_every_n_steps=500 \
        trainer.early_stop_patience=30 \
        --run_dir runs/r5/var_$name >> runs/r5/var_$name.fit.log 2>&1 \
        && break
      log "fit $v attempt $i failed (rc=$?)"
    done
  fi
  if [ -e runs/r5/var_$name/ckpt/last ] && [ ! -e runs/r5/var_$name.test.log ]; then
    log "test $v"
    wait_relay
    timeout 2400 python autoencode.py test $MID \
      --model cfg/ae/decoder/$v.yaml \
      --ckpt_path runs/r5/var_$name/ckpt/last \
      --run_dir runs/r5/var_$name > runs/r5/var_$name.test.log 2>&1
    cp runs/r5/var_$name/metrics.jsonl runs/r5/var_$name.metrics.jsonl 2>/dev/null
    snap var_$name runs/r5/var_$name.fit.log runs/r5/var_$name.test.log \
      runs/r5/var_$name.metrics.jsonl
  fi
done

# ---- 2. learned-f0 HPN vocoder (VERDICT #3) --------------------------------
# r3 diagnosis: voc_ddsp diverged at lr 5e-4 / batch 16 (val_loss 4.7-5.7
# oscillating, f0 head never settled: 1090 cents); voc_golf converged with
# the same machinery (35.8 cents). Recipe: batch 32, lr 1e-4, 6k steps.
if [ ! -e runs/r5/voc_hpn/ckpt/last ]; then
  log "fit voc_hpn (ddsp decoder, stable recipe)"
  for i in 1 2 3; do
    wait_relay
    timeout 10000 python main.py fit --config cfg/vocoder.yaml \
      --model cfg/ae/decoder/ddsp.yaml \
      data.class_path=ltng.data.Synthetic data.init_args.batch_size=32 \
      optimizer.init_args.lr=0.0001 \
      trainer.max_steps=6000 trainer.check_val_every_n_steps=500 \
      trainer.early_stop_patience=30 \
      --run_dir runs/r5/voc_hpn >> runs/r5/voc_hpn.fit.log 2>&1 && break
    log "voc_hpn attempt $i failed (rc=$?)"
  done
fi
if [ -e runs/r5/voc_hpn/ckpt/last ] && [ ! -e runs/r5/voc_hpn.test.log ]; then
  wait_relay
  timeout 3600 python main.py test --config cfg/vocoder.yaml \
    --model cfg/ae/decoder/ddsp.yaml \
    data.class_path=ltng.data.Synthetic data.init_args.batch_size=32 \
    --ckpt_path runs/r5/voc_hpn/ckpt/last \
    --run_dir runs/r5/voc_hpn > runs/r5/voc_hpn.test.log 2>&1
  cp runs/r5/voc_hpn/metrics.jsonl runs/r5/voc_hpn.metrics.jsonl 2>/dev/null
  snap voc_hpn runs/r5/voc_hpn.fit.log runs/r5/voc_hpn.test.log \
    runs/r5/voc_hpn.metrics.jsonl
fi

# ---- 3. LPCNet 10k (VERDICT #4): amsgrad + reference decay -----------------
if [ ! -e runs/r5/lpcnet/ckpt/last ]; then
  log "fit lpcnet phase 1 (4k)"
  for i in 1 2 3; do
    wait_relay
    timeout 10000 python main.py fit --config cfg/lpcnet.yaml \
      data.class_path=ltng.data.Synthetic data.init_args.batch_size=32 \
      trainer.max_steps=4000 trainer.check_val_every_n_steps=1000 \
      --run_dir runs/r5/lpcnet >> runs/r5/lpcnet.fit.log 2>&1 && break
    log "lpcnet p1 attempt $i failed (rc=$?)"
  done
fi
if [ -e runs/r5/lpcnet/ckpt/last ] && [ ! -e runs/r5/lpcnet.test4k.log ]; then
  wait_relay
  timeout 3600 python main.py test --config cfg/lpcnet.yaml \
    data.class_path=ltng.data.Synthetic data.init_args.batch_size=32 \
    --ckpt_path runs/r5/lpcnet/ckpt/last \
    --run_dir runs/r5/lpcnet > runs/r5/lpcnet.test4k.log 2>&1
  snap lpcnet_4k runs/r5/lpcnet.fit.log runs/r5/lpcnet.test4k.log
fi
if [ -e runs/r5/lpcnet/ckpt/last ] && [ ! -e runs/r5/lpcnet.test10k.log ]; then
  log "fit lpcnet phase 2 (-> 10k, resumed)"
  for i in 1 2 3; do
    wait_relay
    timeout 14000 python main.py fit --config cfg/lpcnet.yaml \
      data.class_path=ltng.data.Synthetic data.init_args.batch_size=32 \
      trainer.max_steps=10000 trainer.check_val_every_n_steps=1000 \
      --ckpt_path runs/r5/lpcnet/ckpt/last \
      --run_dir runs/r5/lpcnet >> runs/r5/lpcnet.fit.log 2>&1 && break
    log "lpcnet p2 attempt $i failed (rc=$?)"
  done
  wait_relay
  timeout 3600 python main.py test --config cfg/lpcnet.yaml \
    data.class_path=ltng.data.Synthetic data.init_args.batch_size=32 \
    ar_dump_dir=runs/r5/ar_wavs \
    --ckpt_path runs/r5/lpcnet/ckpt/last \
    --run_dir runs/r5/lpcnet > runs/r5/lpcnet.test10k.log 2>&1
  cp runs/r5/lpcnet/metrics.jsonl runs/r5/lpcnet.metrics.jsonl 2>/dev/null
  snap lpcnet_10k runs/r5/lpcnet.fit.log runs/r5/lpcnet.test10k.log \
    runs/r5/lpcnet.metrics.jsonl
  if [ -e runs/r5/ar_wavs/ar_00.wav ]; then
    mkdir -p docs/results_r5/ar_wavs && cp runs/r5/ar_wavs/*.wav docs/results_r5/ar_wavs/
    git add docs/results_r5/ar_wavs && git commit -q -m "round 5 evidence: LPCNet AR resynthesis wavs" --only docs/results_r5/ar_wavs
  fi
fi

# ---- 4. ss-SGD transfer (VERDICT #9) ---------------------------------------
# (a) finetune the r5 golf-ff anchor sample-wise with the SGD recipe on
#     the SECOND corpus (cfg/ae/synthetic.yaml's Synthetic spec differs
#     from -mid: n_items/duration), (b) from-scratch ss run.
WMODEL="cfg/ae/decoder/golf-precise-stable.yaml"
if [ -e runs/r5/var_golf/ckpt/last ] && [ ! -e runs/r5/ss_corpus2.fit.log.done ]; then
  log "ss transfer A: SGD finetune on corpus 2"
  for i in 1 2 3; do
    wait_relay
    timeout 8000 python autoencode.py fit $MID --model $WMODEL \
      data.init_args.n_items=192 data.init_args.duration=1.5 \
      data.init_args.seed=77 \
      optimizer.class_path=torch.optim.SGD optimizer.init_args.lr=1e-5 \
      model.init_args.coef_smooth_weight=0.1 \
      trainer.max_steps=2500 trainer.check_val_every_n_steps=500 \
      ckpt_params_only=true \
      --ckpt_path runs/r5/var_golf/ckpt/last \
      --run_dir runs/r5/ss_corpus2 >> runs/r5/ss_corpus2.fit.log 2>&1 \
      && { touch runs/r5/ss_corpus2.fit.log.done; break; }
    log "ss corpus2 attempt $i failed (rc=$?)"
  done
  snap ss_corpus2 runs/r5/ss_corpus2.fit.log
fi
if [ ! -e runs/r5/ss_scratch.fit.log.done ]; then
  log "ss transfer B: from-scratch ss (SGD)"
  for i in 1 2 3; do
    wait_relay
    timeout 8000 python autoencode.py fit $MID --model $WMODEL \
      optimizer.class_path=torch.optim.SGD optimizer.init_args.lr=1e-5 \
      trainer.max_steps=2500 trainer.check_val_every_n_steps=500 \
      --run_dir runs/r5/ss_scratch >> runs/r5/ss_scratch.fit.log 2>&1 \
      && { touch runs/r5/ss_scratch.fit.log.done; break; }
    log "ss scratch attempt $i failed (rc=$?)"
  done
  snap ss_scratch runs/r5/ss_scratch.fit.log
fi

log "queue done"

# ---- 5. final perf captures -------------------------------------------------
# const-kernel sweep refresh: "blocked" now means the round-5 blocked
# const kernel; winners may flip vs pallas at small N (ff B=1 serving)
if [ ! -e docs/results_r5/allpole_sweep_r5.log ]; then
  log "allpole sweep refresh"
  wait_relay
  timeout 3600 python tools/allpole_sweep.py --const-only \
    > docs/results_r5/allpole_sweep_r5.log 2>&1 || true
  snap allpole_sweep_r5 docs/results_r5/allpole_sweep_r5.log \
    golf_tpu/ops/allpole_dispatch.json
fi

# ss chain re-profile with INTERLEAVED floors (VERDICT #8)
if [ ! -e docs/results_r5/synth_profile3.json ]; then
  log "ss synth profile (interleaved floors)"
  wait_relay
  timeout 3600 python tools/synth_profile.py \
    > docs/results_r5/synth_profile3.json \
    2> docs/results_r5/synth_profile3.err || true
  snap synth_profile3 docs/results_r5/synth_profile3.json
fi

# ff B=1 serving attribution (VERDICT #5) + test_rtf record
if [ ! -e docs/results_r5/ff_profile.json ]; then
  log "ff synth profile (B=1)"
  wait_relay
  timeout 3600 python tools/synth_profile.py \
    --decoder cfg/ae/decoder/golf.yaml \
    > docs/results_r5/ff_profile.json 2> docs/results_r5/ff_profile.err || true
  snap ff_profile docs/results_r5/ff_profile.json
fi
if [ -e runs/r5/var_golf/ckpt/last ] && [ ! -e docs/results_r5/test_rtf.log ]; then
  log "test_rtf (trained golf_ff)"
  wait_relay
  timeout 3600 python test_rtf.py --config runs/r5/var_golf/config.yaml \
    --ckpt runs/r5/var_golf/ckpt/last \
    > docs/results_r5/test_rtf.log 2>&1 || true
  snap test_rtf docs/results_r5/test_rtf.log
fi

# training-path numbers after the round-5 kernels (custom-VJP LSTM etc.)
if [ ! -e docs/results_r5/train_profile5.json ]; then
  log "train profile"
  wait_relay
  timeout 3600 python tools/train_profile.py \
    > docs/results_r5/train_profile5.json \
    2> docs/results_r5/train_profile5.err || true
  snap train_profile5 docs/results_r5/train_profile5.json
fi
if [ ! -e docs/results_r5/bwd_profile2.json ]; then
  log "bwd profile (post round-5 kernels)"
  wait_relay
  timeout 4000 python tools/bwd_profile.py \
    --out docs/results_r5/bwd_profile2.json \
    2> docs/results_r5/bwd_profile2.err \
    > docs/results_r5/bwd_profile2.out || true
  snap bwd_profile2 docs/results_r5/bwd_profile2.json
fi

# time-L2 + harm/noise analyses on the trained golf anchor (notebook ports)
if [ -e runs/r5/var_golf/ckpt/last ] && [ ! -e docs/results_r5/time_l2.json ]; then
  log "time_l2 analysis"
  wait_relay
  timeout 3600 python tools/time_l2.py \
    --config cfg/ae/synthetic-mid.yaml --model cfg/ae/decoder/golf.yaml \
    --ckpt runs/r5/var_golf/ckpt/last --iters 400 \
    > docs/results_r5/time_l2.json 2> docs/results_r5/time_l2.err || true
  snap time_l2 docs/results_r5/time_l2.json
fi

# steady-state bench capture
if [ ! -e docs/results_r5/bench_r5.json ]; then
  log "bench"
  wait_relay
  timeout 3600 python bench.py > docs/results_r5/bench_r5.json \
    2> docs/results_r5/bench_r5.err || true
  snap bench_r5 docs/results_r5/bench_r5.json
fi
log "queue fully done"
