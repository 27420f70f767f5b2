#!/usr/bin/env python
"""Export harmonic vs noise branches separately per utterance (reference
``harm_and_noise.py``): run encoder + decoder components in isolation,
6 s chunks with 1 s linear crossfade.

Usage:
    python harm_and_noise.py --config runs/<run>/config.yaml \
        --ckpt runs/<run>/ckpt/last --wav-dir <dir> --out-dir <dir>
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def crossfade_chunks(chunks, chunk_len: int, overlap: int) -> np.ndarray:
    hop = chunk_len - overlap
    out = np.zeros(hop * (len(chunks) - 1) + chunk_len)
    p = np.arange(overlap) / max(overlap, 1)
    for i, c in enumerate(chunks):
        c = np.asarray(c)[:chunk_len].copy()
        if i:
            out[i * hop: i * hop + overlap] *= 1 - p
            c[:overlap] *= p
        out[i * hop: i * hop + len(c)] += c
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--chunk-secs", type=float, default=6.0)
    ap.add_argument("--fade-secs", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from golf_tpu.config.registry import load_config
    from golf_tpu.core.sig import Sig
    from golf_tpu.tasks.cli import build_from_config
    from golf_tpu.tasks.data import InferenceDataset, VCTKDataset
    from golf_tpu.utils.wav import write_wav

    cfg = load_config(args.config)
    task, _, _ = build_from_config(cfg)
    sr = cfg["model"]["init_args"].get("sample_rate", 24000)
    chunk = int(args.chunk_secs * sr)
    fade = int(args.fade_secs * sr)

    ds = InferenceDataset(args.wav_dir, "test")
    if len(ds) == 0:
        # generic directory (no speaker-split structure): take every wav
        ds = InferenceDataset(args.wav_dir, "train")
        ds.files = sorted(pathlib.Path(args.wav_dir).glob("**/*.wav"))
    x0, f00, _ = ds[0]
    xs = Sig(jnp.asarray(x0[None, :chunk]), 1)
    f0s = Sig(jnp.asarray(f00[None, :chunk]), 1)
    variables = jax.jit(lambda a, b: task.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        a, b, train=True,
        method=lambda m, *ar, **k: m.training_step(*ar, **k)))(xs, f0s)
    if args.ckpt:
        from golf_tpu.train.checkpoint import load_checkpoint_variables
        variables = {**variables,
                     **load_checkpoint_variables(args.ckpt,
                                                 dict(variables))}

    rngs = {"noise": jax.random.key(3), "dropout": jax.random.key(4)}

    @jax.jit
    def branches(vs, x, f0):
        def body(mdl, x, f0):
            params = mdl.encoder(x, f0=f0)
            params.pop("f0", None)
            params.pop("voicing_logits", None)
            phase = Sig(jnp.where(f0.data == 0, 150.0, f0.data) / sr, 1)
            p = mdl.decoder.apply_ctrl(params)
            dec = mdl.decoder
            harm = dec.harm_oscillator(phase,
                                       *p["harm_oscillator_params"])
            noise = dec.noise_filter(
                dec.noise_generator(harm, *p["noise_generator_params"]),
                *p["noise_filter_params"])
            harm_out = dec.end_filter(harm, *p["end_filter_params"])
            noise_out = dec.end_filter(noise, *p["end_filter_params"])
            return harm_out.data, noise_out.data
        return task.apply(vs, x, f0, rngs=rngs, method=body)

    out_dir = pathlib.Path(args.out_dir)
    for i in range(len(ds)):
        x, f0, rel = ds[i]
        t = len(x)
        hop = chunk - fade
        n_chunks = max(1, (max(t - chunk, 0) + hop - 1) // hop + 1)
        harms, noises = [], []
        for c in range(n_chunks):
            seg = np.zeros(chunk, np.float32)
            fseg = np.zeros(chunk, np.float32)
            s = c * hop
            e = min(s + chunk, t)
            seg[:e - s] = x[s:e]
            fseg[:e - s] = f0[s:e]
            h, n = branches(variables, Sig(jnp.asarray(seg[None]), 1),
                            Sig(jnp.asarray(fseg[None]), 1))
            harms.append(np.asarray(h[0]))
            noises.append(np.asarray(n[0]))
        harm = crossfade_chunks(harms, chunk, fade)[:t]
        noise = crossfade_chunks(noises, chunk, fade)[:t]
        rel_p = pathlib.Path(rel)
        write_wav(str(out_dir / "harm" / rel_p), harm, sr)
        write_wav(str(out_dir / "noise" / rel_p), noise, sr)
        print(f"[{i+1}/{len(ds)}] {rel}")


if __name__ == "__main__":
    main()
