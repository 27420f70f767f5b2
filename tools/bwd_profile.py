#!/usr/bin/env python
"""Backward-pass attribution: where do the 277 ms of bwd+opt go?

train_profile.py splits the step into fwd vs (bwd+opt) only. This tool
times value_and_grad of each sub-graph separately — encoder, decode
chain, MSS loss, optimizer update — with the relay-honest fetch-forced
protocol (utils/timing.py), so the backward budget can be attributed and
attacked stage by stage (round-4 STATUS "Remaining backward budget").

Usage:
  python tools/bwd_profile.py [--batch 32] [--out PATH]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-bench")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--variant", default="golf")
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated case names (smoke/debug)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    import jax.numpy as jnp
    import optax
    import yaml
    from golf_tpu.core.sig import Sig
    from golf_tpu.config.registry import (load_config, deep_update,
                                          resolve_interpolations)
    from golf_tpu.tasks.ae import build_voice_autoencoder
    from golf_tpu.utils.timing import (timed_fetch, fetch_scalar_wrap,
                                       dispatch_floor)

    b, t = args.batch, int(args.seconds * 24000)
    cfg = load_config("cfg/ae/vctk.yaml")["model"]["init_args"]
    with open(f"cfg/ae/decoder/{args.variant}.yaml") as f:
        cfg = deep_update(cfg, resolve_interpolations(yaml.safe_load(f)))
    task = build_voice_autoencoder(cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1)
    f0 = jnp.asarray(np.where(
        rng.uniform(size=(b, t)) > 0.2, 180.0, 0.0).astype(np.float32))

    variables = jax.jit(lambda xs, f0s: task.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        Sig(xs, 1), Sig(f0s, 1), train=True,
        method=lambda m, *a, **k: m.training_step(*a, **k)))(x, f0)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(1e-4))
    p = variables["params"]
    opt_state = tx.init(p)
    aux_vars = {k: v for k, v in variables.items() if k != "params"}
    rngs = {"noise": jax.random.key(3), "dropout": jax.random.key(4)}

    def step_loss(params, xs, f0s):
        out, _ = task.apply(
            {**aux_vars, "params": params}, Sig(xs, 1), Sig(f0s, 1),
            train=True, rngs=rngs, mutable=["stats", "batch_stats"],
            method=lambda m, *a, **k: m.training_step(*a, **k))
        return out[0]

    def full_step(params, opt_st, xs, f0s):
        loss, grads = jax.value_and_grad(step_loss)(params, xs, f0s)
        upd, opt2 = tx.update(grads, opt_st, params)
        return optax.apply_updates(params, upd), opt2, loss

    def enc_fwd(params, xs, f0s):
        out, _ = task.apply(
            {**aux_vars, "params": params}, Sig(xs, 1), Sig(f0s, 1), True,
            rngs=rngs, mutable=["stats", "batch_stats"],
            method=lambda m, *a, **k: m.prepare_training(*a, **k))
        return out

    def scalarize(tree):
        return sum(jnp.sum(l, dtype=jnp.float32)
                   for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "dtype")
                   and jnp.issubdtype(l.dtype, jnp.inexact))

    # concrete ctrl inputs for the decode-side subgraphs
    ctrl, f0_hat, vlog = jax.jit(enc_fwd)(p, x, f0)
    ctrl = jax.tree_util.tree_map(
        lambda l: jax.lax.stop_gradient(l)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
        else l, ctrl)

    def decode_only(params, ctrl_in):
        out, _ = task.apply(
            {**aux_vars, "params": params}, ctrl_in,
            rngs=rngs, mutable=["stats", "batch_stats"],
            method=lambda m, *a, **k: m._decode(*a, **k))
        return out

    x_hat = jax.jit(decode_only)(p, ctrl)
    tmin = min(x_hat.shape[1], x.shape[1])

    def dec_loss(params, ctrl_in, xs):
        y = decode_only(params, ctrl_in)
        return task.criterion(y.data[:, :tmin], xs[:, :tmin])

    def mss(xa, xb):
        return task.criterion(xa, xb)

    x_hat_d = x_hat.data[:, :tmin] * 1.0

    jit = jax.jit

    def fb(fn, argnums=0):
        return lambda *a: jax.value_and_grad(fn, argnums=argnums)(*a)

    fns = {
        "full_step": (jit(full_step), (p, opt_state, x, f0)),
        "step_fwd": (jit(step_loss), (p, x, f0)),
        "step_fwdbwd": (jit(fb(step_loss)), (p, x, f0)),
        "enc_fwd": (jit(lambda *a: scalarize(enc_fwd(*a))), (p, x, f0)),
        "enc_fwdbwd": (jit(fb(lambda *a: scalarize(enc_fwd(*a)))),
                       (p, x, f0)),
        "dec_fwd": (jit(dec_loss), (p, ctrl, x)),
        "dec_fwdbwd": (jit(fb(dec_loss, argnums=(0, 1))), (p, ctrl, x)),
        "synth_fwd": (jit(lambda pp, cc: scalarize(decode_only(pp, cc))),
                      (p, ctrl)),
        "synth_fwdbwd": (jit(fb(
            lambda pp, cc: scalarize(decode_only(pp, cc)),
            argnums=(0, 1))), (p, ctrl)),
        "mss_fwd": (jit(mss), (x_hat_d, x[:, :tmin])),
        "mss_fwdbwd": (jit(fb(mss)), (x_hat_d, x[:, :tmin])),
    }

    only = set(args.only.split(",")) if args.only else None
    times = {}
    for name, (fn, a) in fns.items():
        if a is None or (only and name not in only):
            continue
        g = fetch_scalar_wrap(fn)
        times[name] = timed_fetch(g, *a, n=args.n)
        print(f"# {name}: {times[name]*1e3:.1f} ms", file=sys.stderr)

    ms = {k: round(v * 1e3, 1) for k, v in times.items()}

    def delta(hi, lo):
        return round(ms[hi] - ms[lo], 1) if hi in ms and lo in ms else None

    floor_ms = round(dispatch_floor() * 1e3, 1)
    report = {
        "batch": b, "samples_per_step": b * t,
        "dispatch_floor_ms": floor_ms,
        **ms,
        "opt_ms": delta("full_step", "step_fwdbwd"),
        "enc_bwd_ms": delta("enc_fwdbwd", "enc_fwd"),
        "dec_bwd_ms": delta("dec_fwdbwd", "dec_fwd"),
        "synth_bwd_ms": delta("synth_fwdbwd", "synth_fwd"),
        "mss_bwd_ms": delta("mss_fwdbwd", "mss_fwd"),
        "step_bwd_ms": delta("step_fwdbwd", "step_fwd"),
    }
    report = {k: v for k, v in report.items() if v is not None}
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
