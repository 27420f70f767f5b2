#!/usr/bin/env python
"""Streaming synthesis demo: drive ``golf_tpu.serve.GOLFStream`` from a
trained checkpoint, chunk by chunk, and report per-chunk latency.

Runs the encoder offline on one utterance (analysis is frame-rate and
cheap; a causal/chunked encoder is future work — the BiLSTM backbone is
bidirectional), then streams the decoder: one jitted dispatch per chunk,
constant memory, 2-chunk algorithmic latency.

    python scripts/stream_demo.py --config cfg/ae/synthetic-mid.yaml \
        --model cfg/ae/decoder/golf-precise-stable.yaml \
        --ckpt_path runs/r2/golf_ss2b/ckpt/last --out /tmp/stream.wav
"""
import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from golf_tpu.utils.axon_boot import ensure_fixed_session  # noqa: E402

ensure_fixed_session("golf-tpu-bench")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", action="append", default=[])
    ap.add_argument("--model", default=None)
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--chunk", type=int, default=2400)
    ap.add_argument("--out", default=None)
    ap.add_argument("--enc_context", type=int, default=0,
                    help="stream the ENCODER too: windowed recomputation "
                         "with this many frames of context+lookahead "
                         "(0 = offline encoder)")
    ap.add_argument("--enc_stream", type=int, default=0,
                    help="stream the encoder EXACTLY-causal "
                         "(serve/enc_stream.py): forward LSTM state "
                         "carried, backward truncated to this many "
                         "lookahead frames (0 = off)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    from golf_tpu.utils.axon_boot import ensure_fast_connection
    if jax.default_backend() not in ("cpu",):
        ensure_fast_connection()
    import yaml
    from golf_tpu.config.registry import (apply_overrides, deep_update,
                                          instantiate,
                                          resolve_interpolations)
    from golf_tpu.core.sig import Sig
    from golf_tpu.serve import GOLFStream
    from golf_tpu.tasks.cli import build_from_config

    cfg = {}
    for path in args.config:
        with open(path) as f:
            cfg = deep_update(cfg, yaml.safe_load(f))
    if args.model:
        with open(args.model) as f:
            cfg.setdefault("model", {}).setdefault("init_args", {})
            cfg["model"]["init_args"] = deep_update(
                cfg["model"]["init_args"], yaml.safe_load(f))
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
    cfg = resolve_interpolations(cfg)

    task, datamodule, trainer_kwargs = build_from_config(cfg)
    from golf_tpu.train.loop import Trainer
    trainer = Trainer(task, run_dir="/tmp/stream_demo_run",
                      **trainer_kwargs)
    datamodule.setup("fit")
    batch = next(iter(datamodule.val_dataloader()))
    state = trainer.init_state(batch)
    state = trainer.ckpt.restore_into(args.ckpt_path, state)
    variables = {"params": state.params, "stats": state.stats,
                 "batch_stats": state.batch_stats}

    # one utterance, trimmed to whole chunks
    x = np.asarray(batch[0])[:1]
    f0 = np.asarray(batch[1])[:1]
    chunk = args.chunk
    t = (x.shape[1] // chunk) * chunk
    x, f0 = x[:, :t], f0[:, :t]
    n_chunks = t // chunk
    sr = cfg["model"].get("init_args", {}).get("sample_rate", 24000)

    # offline analysis (frame-rate): raw ctrl + sample-rate phase
    @jax.jit
    def analyze(xs, f0s):
        raw, _, _ = task.apply(
            variables, Sig(xs, 1), Sig(f0s, 1), False,
            rngs={"noise": jax.random.key(0), "dropout": jax.random.key(0)},
            method=lambda m, *a: m.prepare_training(*a))
        phase = raw.pop("phase")
        raw.pop("voicing", None)
        ctrl = task.apply(variables,
                          {k: v for k, v in raw.items()
                           if k.endswith("_params")},
                          method=lambda m, r: m.decoder.apply_ctrl(r))
        return ctrl, phase.data

    ctrl, phase = analyze(x, f0)
    jax.block_until_ready(phase)

    decoder = instantiate(cfg["model"]["init_args"]["decoder"])
    dec_vars = {"params": state.params["decoder"],
                "batch_stats": state.batch_stats.get("decoder", {})}
    stream = GOLFStream(decoder, dec_vars, chunk=chunk)
    hop = stream.hop
    rpc, rpt = chunk // hop, chunk // stream.table_hop

    def ctrl_err_report(win_ctrl, tag):
        """Max ctrl-row error of per-chunk streamed ctrl vs offline."""
        errs = []
        for k in ("harm_oscillator_params", "noise_filter_params",
                  "end_filter_params"):
            if k not in ctrl:
                continue
            for i, s in enumerate(ctrl[k]):
                off = np.concatenate(
                    [np.asarray(w[k][i].data) for w in win_ctrl], axis=1)
                ref = np.asarray(s.data)[:, :off.shape[1]]
                e = float(np.abs(off - ref).max()
                          / (np.abs(ref).max() + 1e-9))
                errs.append(e)
                if e > 1e-3:
                    rowbad = int(np.abs(off - ref).max(
                        axis=(0,) + tuple(range(2, off.ndim))).argmax())
                    print(f"#   leaf {k}[{i}] err {e:.3e} at row "
                          f"{rowbad}/{off.shape[1]}", file=sys.stderr)
        print(json.dumps({tag: round(max(errs), 8)}), file=sys.stderr)

    if args.enc_stream:
        # EXACT-CAUSAL encoder streaming: forward conv/LSTM state carried
        # exactly, only the backward LSTM truncated to L lookahead frames
        from golf_tpu.serve.enc_stream import StreamingEncoder
        L = args.enc_stream
        enc_vars = {"params": state.params["encoder"],
                    "stats": state.stats.get("encoder", {}),
                    "batch_stats": state.batch_stats.get("encoder", {})}
        se = StreamingEncoder(task.encoder, enc_vars, lookahead=L,
                              batch=1)
        raw_parts, enc_lat = [], []
        for c in range(n_chunks):
            t0 = time.perf_counter()
            r = se.push(x[:, c * chunk:(c + 1) * chunk],
                        f0[:, c * chunk:(c + 1) * chunk])
            enc_lat.append(time.perf_counter() - t0)
            if r is not None:
                raw_parts.append(r)
        r = se.flush()
        if r is not None:
            raw_parts.append(r)

        def cat_group(key):
            g0 = raw_parts[0][key]
            if isinstance(g0, tuple):
                return tuple(Sig(np.concatenate(
                    [np.asarray(p[key][i].data) for p in raw_parts], 1),
                    g0[i].hop) for i in range(len(g0)))
            return Sig(np.concatenate(
                [np.asarray(p[key].data) for p in raw_parts], 1), g0.hop)

        raw_all = {k: cat_group(k) for k in raw_parts[0]
                   if k.endswith("_params")}

        # apply_ctrl over the assembled rows, sliced per chunk — the
        # table-weight Downsampler pools CENTERED windows (k//2 pad), so
        # a chunk's table row needs ~hop_rate/2 future frame rows; that
        # lookahead is already covered by the encoder's emission lag
        ctrl_fn = jax.jit(lambda rw: task.apply(
            variables, rw, method=lambda m, r: m.decoder.apply_ctrl(r)))
        ctrl_all = ctrl_fn(raw_all)
        win_ctrl = []
        for c in range(n_chunks):
            cc = {}
            for k, g in ctrl_all.items():
                outk = []
                for s in g:
                    per = max(rpc // max(s.hop // hop, 1), 1)
                    outk.append(Sig(s.data[:, c * per:(c + 1) * per],
                                    s.hop))
                cc[k] = tuple(outk)
            win_ctrl.append(cc)
        med_enc = sorted(enc_lat[2:])[max(len(enc_lat[2:]) // 2, 0)] \
            if len(enc_lat) > 2 else float("nan")
        n_rows = next(iter(raw_all.values()))[0].data.shape[1]
        print(json.dumps({
            "enc_stream_lookahead_frames": L,
            "enc_algorithmic_latency_ms": round(
                (L + se.edge) * hop / sr * 1e3, 1),
            "enc_median_push_latency_ms": round(med_enc * 1e3, 2),
            "enc_rows": n_rows}), file=sys.stderr)
        ctrl_err_report(win_ctrl, "enc_stream_ctrl_rel_err")

        def chunk_ctrl_for(c):
            return win_ctrl[c]
    elif args.enc_context:
        # WINDOWED-ENCODER streaming: recompute the (BiLSTM) encoder per
        # chunk on [C frames context | chunk | C frames lookahead] and
        # keep only the central ctrl rows — the trained BiLSTM's memory
        # decays with context (typical mid-stream decay measured on the
        # golf_ff ckpt: 8e-3 / 9e-4 / 7e-5 / 4e-6 at C=8/16/32/64
        # frames; worst-case rows at signal transients need more:
        # 4e-2 / 1.2e-2 / 3e-4 at C=30/60/100 over a full utterance on
        # the ss2 ckpt). This mode is APPROXIMATE by design — the demo
        # prints the measured ctrl error vs the offline encoder.
        # Full-pipeline streaming = this + GOLFStream.
        rate = stream.table_hop // hop
        C = -(-args.enc_context // rate) * rate  # align the window start
        # to the table-weight pooling grid (AvgPool groups of hop_rate
        # frames), else windowed table rows pool different frame groups
        ctx = C * hop
        win_ctrl = []
        for c in range(n_chunks):
            s0 = max(0, c * chunk - ctx)
            s1 = min(t, (c + 1) * chunk + ctx)
            wc, _ = analyze(x[:, s0:s1], f0[:, s0:s1])
            r0 = (c * chunk - s0) // hop
            sliced = {}
            for k, sigs in wc.items():
                outk = []
                for s in sigs:
                    ratio = s.hop // hop if s.hop >= hop else 1
                    rr0, nn = r0 // ratio, max(rpc // ratio, 1)
                    outk.append(Sig(s.data[:, rr0:rr0 + nn], s.hop))
                sliced[k] = tuple(outk)
            win_ctrl.append(sliced)
        # max central-row error vs the offline encoder (evidence line)
        print(json.dumps({"enc_context_frames": C}), file=sys.stderr)
        ctrl_err_report(win_ctrl, "windowed_ctrl_rel_err")

        def chunk_ctrl_for(c):
            return win_ctrl[c]
    else:
        def chunk_ctrl_for(c):
            return None

    def rows(sig, c, per):
        return Sig(sig.data[:, c * per:(c + 1) * per], sig.hop)

    outs, lat = [], []
    for c in range(n_chunks):
        cc = chunk_ctrl_for(c) or {
            "harm_oscillator_params": (
                rows(ctrl["harm_oscillator_params"][0], c, rpt),),
            "noise_filter_params": (
                rows(ctrl["noise_filter_params"][0], c, rpc),),
            "end_filter_params": (
                rows(ctrl["end_filter_params"][0], c, rpc),
                rows(ctrl["end_filter_params"][1], c, rpc)),
        }
        t0 = time.perf_counter()
        out = stream.push(cc, phase[:, c * chunk:(c + 1) * chunk])
        lat.append(time.perf_counter() - t0)
        if out is not None:
            outs.append(out)
    tail = {k: (Sig(v[0].data[:, n_chunks * (rpt if k.startswith("harm")
                                             else rpc):],
                    v[0].hop),) + tuple(v[1:])
            for k, v in ctrl.items() if k in (
                "harm_oscillator_params", "noise_filter_params")}
    tail["end_filter_params"] = (
        Sig(ctrl["end_filter_params"][0].data[:, n_chunks * rpc:], hop),
        Sig(ctrl["end_filter_params"][1].data[:, n_chunks * rpc:], hop))
    outs.append(stream.flush(tail))
    audio = np.concatenate(outs, axis=1)

    if args.out:
        from golf_tpu.utils.wav import write_wav
        write_wav(args.out, audio[0], sr)
    warm = sorted(lat[2:])  # first pushes include compile
    med = warm[len(warm) // 2] if warm else float("nan")
    print(json.dumps({
        "chunks": n_chunks, "chunk_samples": chunk,
        "chunk_ms": round(chunk / sr * 1e3, 1),
        "median_push_latency_ms": round(med * 1e3, 2),
        "xrt_per_stream": round(chunk / sr / med, 1),
        "out": args.out, "samples": int(audio.shape[1]),
    }))


if __name__ == "__main__":
    main()
