#!/usr/bin/env python
"""Training-throughput benchmark: GOLF training step on the real chip.

Reports samples/s (audio samples consumed per second of wall time) for the
full jitted train step (fwd + bwd + adam) at the reference recipe's
2 s @ 24 kHz segments.

Usage: python tools/train_bench.py [--batch 16] [--steps 20] [--variant golf|golf-precise|ddsp]
"""

import argparse
import json
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session
ensure_fixed_session("golf-tpu-bench")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variant", default="golf")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import yaml
    from golf_tpu.core.sig import Sig
    from golf_tpu.config.registry import (load_config, deep_update,
                                          resolve_interpolations)
    from golf_tpu.tasks.ae import build_voice_autoencoder

    sr = 24000
    b, t = args.batch, int(args.seconds * 24000)
    cfg = load_config("cfg/ae/vctk.yaml")["model"]["init_args"]
    with open(f"cfg/ae/decoder/{args.variant}.yaml") as f:
        cfg = deep_update(cfg, resolve_interpolations(yaml.safe_load(f)))
    task = build_voice_autoencoder(cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1)
    f0 = jnp.asarray(
        np.where(rng.uniform(size=(b, t)) > 0.2, 180.0, 0.0)
        .astype(np.float32))

    t0 = time.time()
    variables = jax.jit(lambda xs, f0s: task.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        Sig(xs, 1), Sig(f0s, 1), train=True,
        method=lambda m, *a, **k: m.training_step(*a, **k)))(x, f0)
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(1e-4))
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(params, opt_state, stats, bstats, x, f0, key):
        def loss_fn(p):
            out, mut = task.apply(
                {"params": p, "stats": stats, "batch_stats": bstats},
                Sig(x, 1), Sig(f0, 1), train=True,
                rngs={"noise": key, "dropout": key},
                mutable=["stats", "batch_stats"],
                method=lambda m, *a, **k: m.training_step(*a, **k))
            return out[0], mut
        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, mut.get("stats", stats),
                mut.get("batch_stats", bstats), loss)

    params = variables["params"]
    stats = variables.get("stats", {})
    bstats = variables.get("batch_stats", {})
    t0 = time.time()
    params, opt_state, stats, bstats, loss = train_step(
        params, opt_state, stats, bstats, x, f0, jax.random.key(3))
    loss.block_until_ready()
    print(f"# compile+first step {time.time()-t0:.1f}s, loss "
          f"{float(loss):.3f}", file=sys.stderr)

    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, stats, bstats, loss = train_step(
            params, opt_state, stats, bstats, x, f0, jax.random.key(4 + i))
    loss.block_until_ready()
    dt = (time.time() - t0) / args.steps
    sps = b * t / dt
    print(json.dumps({
        "metric": f"{args.variant}_train_samples_per_sec",
        "value": round(sps),
        "unit": "samples/s/chip",
        "step_ms": round(dt * 1000, 1),
        "loss": round(float(loss), 3),
    }))


if __name__ == "__main__":
    main()
