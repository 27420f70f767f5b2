#!/usr/bin/env python
"""Extract per-frame LPC-as-biquads, gains, voicing, and Rd table weights
from a trained model by indexing the encoder's split layout (reference
``biquads.py:13-107``).

Usage:
    python biquads.py --config runs/<run>/config.yaml \
        --ckpt runs/<run>/ckpt/last --wav in.wav --out out.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from golf_tpu.config.registry import load_config
    from golf_tpu.core.sig import Sig
    from golf_tpu.tasks.cli import build_from_config
    from golf_tpu.utils.wav import read_wav

    cfg = load_config(args.config)
    task, _, _ = build_from_config(cfg)
    sr = cfg["model"]["init_args"].get("sample_rate", 24000)

    wav, fsr = read_wav(args.wav)
    assert fsr == sr
    x = Sig(jnp.asarray(wav.reshape(1, -1)), 1)
    f0 = Sig(jnp.full((1, wav.size), 150.0, jnp.float32), 1)

    variables = jax.jit(lambda a, b: task.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        a, b, train=True,
        method=lambda m, *ar, **k: m.training_step(*ar, **k)))(x, f0)
    if args.ckpt:
        from golf_tpu.train.checkpoint import load_checkpoint_variables
        variables = {**variables,
                     **load_checkpoint_variables(args.ckpt,
                                                 dict(variables))}

    def body(mdl, x, f0):
        raw = mdl.encoder(x, f0=f0)
        voicing = raw.pop("voicing_logits", None)
        f0_hat = raw.pop("f0", None)
        params = mdl.decoder.apply_ctrl(raw)
        out = {"raw": raw, "params": params}
        if voicing is not None:
            out["voicing"] = jax.nn.sigmoid(voicing.data)
        if f0_hat is not None:
            out["f0"] = f0_hat.data
        return out

    out = task.apply(variables, x, f0,
                     rngs={"noise": jax.random.key(3),
                           "dropout": jax.random.key(4)}, method=body)

    arrays = {}
    ef = out["params"].get("end_filter_params", ())
    if len(ef) == 2:
        gain, a = ef
        arrays["gain"] = np.asarray(gain.data)
        arrays["lpc"] = np.asarray(a.data)
        # factor LPC into biquad sections via polynomial roots
        lpc = np.asarray(a.data)[0]
        biquads = []
        for frame in lpc:
            roots = np.roots(np.concatenate([[1.0], frame]))
            roots = roots[np.imag(roots) >= 0]
            sec = [np.array([1.0, -2 * r.real, abs(r) ** 2])
                   if r.imag > 1e-9 else None for r in roots]
            biquads.append([s for s in sec if s is not None])
        if biquads and all(len(b) == len(biquads[0]) for b in biquads):
            arrays["biquads"] = np.asarray(biquads)
    ho = out["params"].get("harm_oscillator_params", ())
    if len(ho) >= 1:
        arrays["table_weight"] = np.asarray(ho[0].data)
    if "voicing" in out:
        arrays["voicing"] = np.asarray(out["voicing"])
    if "f0" in out:
        arrays["f0"] = np.asarray(out["f0"])

    np.savez(args.out, **arrays)
    print(f"saved {sorted(arrays)} to {args.out}")


if __name__ == "__main__":
    main()
