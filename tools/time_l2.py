#!/usr/bin/env python
"""Phase-aligned time-domain L2 analysis (reference
``notebooks/ismir/time_l2.ipynb``): freeze a trained autoencoder, attach
learnable per-frame phase offsets (wrapped-difference smoothing,
``smooth_phase_offset``, reference ``models/utils.py:547-554``), and
optimize them with Adam to minimize time-domain MSE between resynthesis
and target. The ISMIR paper uses this to compare vocoders in the time
domain, where raw phase mismatch would otherwise dominate.

Usage:
  python tools/time_l2.py --config cfg/ae/synthetic-mid.yaml \
      --model cfg/ae/decoder/golf.yaml --ckpt runs/r5/var_golf/ckpt/last \
      [--item 0] [--iters 500] [--lr 1e-3] [--offset_hop 1200] [--out x.wav]

Prints one JSON line: initial/final time-domain MSE/L2.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cfg/ae/synthetic-mid.yaml")
    ap.add_argument("--model", default="cfg/ae/decoder/golf.yaml")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--item", type=int, default=0)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--offset_hop", type=int, default=1200,
                    help="phase-offset frame hop (reference uses 1200)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import yaml
    from golf_tpu.config.registry import (load_config, deep_update,
                                          instantiate,
                                          resolve_interpolations)
    from golf_tpu.core.sig import Sig, linear_upsample
    from golf_tpu.ops.dsp import smooth_phase_offset
    from golf_tpu.tasks.ae import build_voice_autoencoder
    from golf_tpu.train.checkpoint import load_checkpoint_variables

    full = load_config(args.config)
    cfg = full["model"]["init_args"]
    with open(args.model) as f:
        cfg = deep_update(cfg, resolve_interpolations(yaml.safe_load(f)))
    task = build_voice_autoencoder(cfg)
    sr = cfg.get("sample_rate", 24000)

    dm = instantiate(full["data"], tuples=False)
    dm.setup("test")
    x_np, f0_np = dm.test_dataset[args.item]
    x = jnp.asarray(x_np)[None]
    f0 = jnp.asarray(f0_np)[None]

    template = jax.eval_shape(
        lambda: task.init({"params": jax.random.key(0),
                           "noise": jax.random.key(1),
                           "dropout": jax.random.key(2)},
                          Sig(x, 1), Sig(f0, 1), train=True,
                          method=lambda m, *a, **k: m.training_step(
                              *a, **k)))
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), template)
    variables = {**template, **load_checkpoint_variables(args.ckpt,
                                                         template)}

    # encode once (frozen); predict-style phase: unvoiced -> 150 Hz
    # (reference ltng/ae.py:276-291)
    enc = jax.jit(lambda xs, f0s: task.apply(
        variables, Sig(xs, 1), Sig(f0s, 1), False,
        method=lambda m, a, b, tr: m.encoder(a, f0=b, train=tr)))(x, f0)
    enc = dict(enc)
    enc.pop("f0", None)
    vlog = enc.pop("voicing_logits", None)
    if vlog is not None:
        enc["voicing"] = Sig(jax.nn.sigmoid(vlog.data), vlog.hop)
    phase0 = jnp.where(f0 == 0, 150.0, f0) / sr          # (1, T), hop 1

    def decode_with_offset(offsets, rng):
        off = smooth_phase_offset(offsets)
        up = linear_upsample(off, args.offset_hop)
        t = min(up.shape[1], phase0.shape[1])
        params = dict(enc)
        params["phase"] = Sig(phase0[:, :t] + up[:, :t], 1)
        y = task.apply(variables, params, rngs={"noise": rng},
                       method=lambda m, p_: m._decode(p_))
        return y.data[0]

    n_off = x.shape[1] // args.offset_hop + 2
    offsets = jnp.zeros((1, n_off), jnp.float32)
    rng = jax.random.key(1)

    def loss_fn(offs):
        y = decode_with_offset(offs, rng)
        t = min(y.shape[0], x.shape[1])
        return jnp.mean((y[:t] - x[0, :t]) ** 2)

    tx = optax.adam(args.lr)
    opt_state = tx.init(offsets)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    l0 = float(vg(offsets)[0])
    best = (l0, offsets)
    for i in range(args.iters):
        l, g = vg(offsets)
        upd, opt_state = tx.update(g, opt_state, offsets)
        offsets = optax.apply_updates(offsets, upd)
        if float(l) < best[0]:
            best = (float(l), offsets)
        if i % 100 == 0:
            print(f"# iter {i}: mse {float(l):.6f}", file=sys.stderr)

    y = np.asarray(decode_with_offset(best[1], rng))
    t = min(len(y), x.shape[1])
    report = {
        "initial_mse": l0, "final_mse": best[0],
        "initial_l2": l0 * t, "final_l2": best[0] * t,
        "iters": args.iters, "offset_hop": args.offset_hop,
        "model": args.model, "ckpt": args.ckpt,
    }
    print(json.dumps(report))
    if args.out:
        from golf_tpu.utils.wav import write_wav
        write_wav(args.out, y[:t], sr)


if __name__ == "__main__":
    main()
