#!/usr/bin/env python
"""Train the shipped neural pitch estimator on synthetic data.

The reference's `penn` method relies on pretrained FCNF0++ weights that
cannot enter this image; this trainer produces an in-image substitute:
random harmonic sources (glottal-ish rolloff, random amplitudes/phases,
vibrato) mixed with noise at random SNR, plus pure-noise unvoiced
frames. Voiced frames get Gaussian-blurred one-hot targets over cents
bins; unvoiced frames get the uniform distribution (so max-prob, used
as periodicity, is low and the 0.065 gate fires).

Writes golf_tpu/assets/pitchnet.msgpack (bf16, ~1.5 MB) + a held-out
eval line (cents MAE on clean/noisy voiced frames, unvoiced gate rate).

Runs fine on CPU (~5 min at the default 3000 steps):
    JAX_PLATFORMS=cpu python tools/train_pitchnet.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from golf_tpu.models.pitchnet import (  # noqa: E402
    FRAME, ANALYSIS_SR, N_BINS, CENTS_PER_BIN, FMIN, FMAX,
    PitchNet, decode, f0_to_bin)


def make_batch(rng: np.random.Generator, b: int, voiced_frac: float = 0.8):
    """Synthetic frames + target distributions."""
    t = (np.arange(FRAME) - FRAME / 2) / ANALYSIS_SR
    f0 = np.exp(rng.uniform(np.log(FMIN * 1.02), np.log(FMAX * 0.98), b))
    voiced = rng.uniform(0, 1, b) < voiced_frac
    # vibrato + slow drift so frames are not perfectly stationary
    vib = (1.0 + rng.uniform(0, 0.01, (b, 1)) *
           np.sin(2 * np.pi * rng.uniform(3, 7, (b, 1)) * t[None, :] +
                  rng.uniform(0, 2 * np.pi, (b, 1))))
    inst_f0 = f0[:, None] * vib
    phase = np.cumsum(inst_f0 / ANALYSIS_SR, -1)
    phase += rng.uniform(0, 1, (b, 1))
    n_harm = 24
    k = np.arange(1, n_harm + 1)
    # random spectral rolloff (glottal sources fall 6-18 dB/oct)
    rolloff = rng.uniform(0.5, 2.0, (b, 1))
    amps = k[None, :] ** (-rolloff) * rng.uniform(0.3, 1.0, (b, n_harm))
    amps = np.where(k[None, :] * f0[:, None] < ANALYSIS_SR / 2 * 0.95,
                    amps, 0.0)
    ph = rng.uniform(0, 2 * np.pi, (b, n_harm))
    x = np.einsum("bk,bkt->bt", amps,
                  np.sin(2 * np.pi * k[None, :, None] * phase[:, None, :]
                         + ph[..., None])).astype(np.float32)
    x /= np.abs(x).max(-1, keepdims=True) + 1e-6
    snr_db = rng.uniform(3, 40, (b, 1))
    noise = rng.standard_normal((b, FRAME)).astype(np.float32)
    noise *= (x.std(-1, keepdims=True) / (noise.std(-1, keepdims=True)
              + 1e-9)) * 10 ** (-snr_db / 20)
    x = np.where(voiced[:, None], x + noise,
                 rng.standard_normal((b, FRAME)).astype(np.float32))
    # targets: blurred one-hot for voiced, uniform for unvoiced
    centers = f0_to_bin(f0)
    bins = np.arange(N_BINS)
    sigma = 2.5  # bins (25 cents)
    tgt = np.exp(-0.5 * ((bins[None, :] - centers[:, None]) / sigma) ** 2)
    tgt /= tgt.sum(-1, keepdims=True)
    tgt = np.where(voiced[:, None], tgt, np.full_like(tgt, 1.0 / N_BINS))
    return x, tgt.astype(np.float32), f0, voiced


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    model = PitchNet()
    params = model.init(jax.random.key(args.seed), jnp.zeros((1, FRAME)))
    opt = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps))
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, x, tgt):
        def loss_fn(p):
            logits = model.apply(p, x)
            return -(tgt * jax.nn.log_softmax(logits, -1)).sum(-1).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, ost = opt.update(g, ost, params)
        return optax.apply_updates(params, up), ost, loss

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for i in range(args.steps):
        x, tgt, _, _ = make_batch(rng, args.batch)
        params, ost, loss = step(params, ost, jnp.asarray(x),
                                 jnp.asarray(tgt))
        if i % 200 == 0 or i == args.steps - 1:
            print(f"step {i} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval
    erng = np.random.default_rng(args.seed + 12345)
    x, _, f0, voiced = make_batch(erng, 256)
    f0_hat, per = decode(model.apply(params, jnp.asarray(x)))
    f0_hat, per = np.asarray(f0_hat), np.asarray(per)
    v = voiced & (f0_hat > 0)
    cents = 1200 * np.abs(np.log2(np.maximum(f0_hat[v], 1e-6) /
                                  f0[v]))
    uv_gate = float((f0_hat[~voiced] == 0).mean()) if (~voiced).any() else 1.0
    v_rate = float((f0_hat[voiced] > 0).mean())
    print(f"eval: cents MAE {cents.mean():.1f} (median {np.median(cents):.1f})"
          f" voiced-detect {v_rate:.3f} unvoiced-gated {uv_gate:.3f}")

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "golf_tpu", "assets", "pitchnet.msgpack")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    small = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.dtype(jnp.bfloat16)), params)
    with open(out, "wb") as fh:
        fh.write(serialization.to_bytes(small))
    print(f"wrote {out} ({os.path.getsize(out)//1024} KiB)")


if __name__ == "__main__":
    main()
