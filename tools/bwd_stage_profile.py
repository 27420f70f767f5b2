#!/usr/bin/env python
"""Per-stage BACKWARD attribution of the training decode chain.

bwd_profile.py splits the step into enc/dec/mss/opt; this tool goes one
level deeper: for each decode stage (ctrl transforms, wavetable source,
noise filter, frame-wise all-pole end filter, room filter) it times the
stage's forward and its value_and_grad (w.r.t. the stage's params AND
inputs) at the training shape, K-amortized inside one executable so the
relay dispatch floor cancels per stage (addresses the round-4 floor-drift
artifact: each number is an average over K in-graph repeats of the same
dispatch, so a drifting floor cannot invert sums).

Usage: python tools/bwd_stage_profile.py [--batch 32] [--out PATH]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-bench")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--k_amort", type=int, default=4)
    ap.add_argument("--decoder", default="cfg/ae/decoder/golf.yaml")
    ap.add_argument("--out", default=None)
    cli = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    from golf_tpu.utils.axon_boot import ensure_fast_connection
    if jax.default_backend() not in ("cpu",):
        ensure_fast_connection()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from golf_tpu.core.sig import Sig
    from golf_tpu.config.registry import instantiate, load_config

    sr = 24000
    t = int(sr * cli.seconds)
    hop = 240
    frames = t // hop + 1
    b = cli.batch
    k_amort = cli.k_amort

    decoder = instantiate(load_config(cli.decoder)["decoder"])

    r = np.random.default_rng(0)
    raw = {
        "harm_oscillator_params": (
            Sig(jnp.asarray(r.standard_normal(
                (b, frames, 64)).astype(np.float32) * 0.1), hop),),
        "noise_generator_params": (),
        "noise_filter_params": (
            Sig(jnp.asarray(r.standard_normal(
                (b, frames, 256)).astype(np.float32) * 0.1 - 3.0), hop),),
        "end_filter_params": (
            Sig(jnp.asarray(r.standard_normal(
                (b, frames)).astype(np.float32) * 0.1), hop),
            Sig(jnp.asarray(r.standard_normal(
                (b, frames, 22)).astype(np.float32) * 0.3), hop)),
        "room_filter_params": (),
    }
    phase = Sig(jnp.full((b, t), 180.0 / sr), 1)

    var_shapes = jax.eval_shape(
        lambda ph, rw: decoder.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            ph, rw, method=lambda m, p_, r_: m(p_, **m.apply_ctrl(r_))),
        phase, raw)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)

    def apply(vs, fn, *args):
        return decoder.apply(vs, *args,
                             rngs={"noise": jax.random.key(2)}, method=fn)

    _floor = [None]

    def fetch_floor():
        if _floor[0] is None:
            tiny = jax.jit(lambda a: a * 1.0000001 + 1.0)
            float(tiny(jnp.float32(0.0)))
            fs = []
            for i in range(9):
                t0 = time.perf_counter()
                float(tiny(jnp.float32(i)))
                fs.append(time.perf_counter() - t0)
            fs.sort()
            _floor[0] = fs[len(fs) // 2]
        return _floor[0]

    def sumtree(out):
        return sum(jnp.sum(l, dtype=jnp.float32)
                   for l in jax.tree_util.tree_leaves(out)
                   if hasattr(l, "dtype")
                   and jnp.issubdtype(l.dtype, jnp.inexact))

    def amortize(f, *args, grad=False):
        """Time f (or value_and_grad of sumtree(f)) K times in one jit."""
        if grad:
            def loss(*a):
                return sumtree(f(*a))
            g = jax.value_and_grad(loss, argnums=tuple(range(len(args))))

            def unit(*a):
                v, gr = g(*a)
                return v + sumtree(gr)
        else:
            def unit(*a):
                return sumtree(f(*a))

        stacked = jax.tree_util.tree_map(
            lambda a: (jnp.stack([a * (1.0 + 0.01 * i)
                                  for i in range(k_amort)])
                       if hasattr(a, "dtype")
                       and jnp.issubdtype(a.dtype, jnp.inexact) else
                       jnp.stack([a] * k_amort)),
            list(args))

        def k_fn(xs, jitter):
            def step(c, leaf):
                return c, unit(*leaf) + jitter
            _, ys = jax.lax.scan(step, 0.0, xs)
            return ys

        jf = jax.jit(k_fn)
        np.asarray(jf(stacked, jnp.float32(0.0)))
        floor = fetch_floor()
        ts = []
        for i in range(1, 6):
            t0 = time.perf_counter()
            np.asarray(jf(stacked, jnp.float32(i * 1e-7)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return max(ts[len(ts) // 2] - floor, 1e-7) / k_amort * 1e3

    # concrete stage inputs
    ctrl = jax.jit(lambda vs, rw: apply(
        vs, lambda m, r_: m.apply_ctrl(r_), rw))(variables, raw)
    harm = jax.jit(lambda vs, ph, c: apply(
        vs,
        lambda m, p_, c_: m.harm_oscillator(p_, *c_["harm_oscillator_params"]),
        ph, c))(variables, phase, ctrl)
    noise = jax.jit(lambda vs, h, c: apply(
        vs,
        lambda m, h_, c_: m.noise_generator(h_, *c_["noise_generator_params"]),
        h, c))(variables, harm, ctrl)
    nf = jax.jit(lambda vs, n, c: apply(
        vs, lambda m, n_, c_: m.noise_filter(n_, *c_["noise_filter_params"]),
        n, c))(variables, noise, ctrl)
    tmin = min(harm.data.shape[1], nf.data.shape[1])
    src = Sig(harm.data[:, :tmin] + nf.data[:, :tmin], 1)
    ef = jax.jit(lambda vs, s, c: apply(
        vs, lambda m, s_, c_: m.end_filter(s_, *c_["end_filter_params"]),
        s, c))(variables, src, ctrl)

    stages = {
        "ctrl": (lambda vs, rw: apply(
            vs, lambda m, r_: m.apply_ctrl(r_), rw), (variables, raw)),
        "harm_source": (lambda vs, ph, c: apply(
            vs, lambda m, p_, c_: m.harm_oscillator(
                p_, *c_["harm_oscillator_params"]).data, ph, c),
            (variables, phase, ctrl)),
        "noise_filter": (lambda vs, n, c: apply(
            vs, lambda m, n_, c_: m.noise_filter(
                n_, *c_["noise_filter_params"]).data, n, c),
            (variables, noise, ctrl)),
        "end_filter": (lambda vs, s, c: apply(
            vs, lambda m, s_, c_: m.end_filter(
                s_, *c_["end_filter_params"]).data, s, c),
            (variables, src, ctrl)),
        "room": (lambda vs, y, c: apply(
            vs, lambda m, y_, c_: m.room_filter(
                y_, *c_["room_filter_params"]).data, y, c),
            (variables, ef, ctrl)),
        "full_decode": (lambda vs, ph, rw: apply(
            vs, lambda m, p_, r_: m(p_, **m.apply_ctrl(r_)).data, ph, rw),
            (variables, phase, raw)),
    }

    res = {}
    for name, (f, a) in stages.items():
        res[f"{name}_fwd_ms"] = round(amortize(f, *a), 2)
        res[f"{name}_fwdbwd_ms"] = round(amortize(f, *a, grad=True), 2)
        res[f"{name}_bwd_ms"] = round(
            res[f"{name}_fwdbwd_ms"] - res[f"{name}_fwd_ms"], 2)
        print(f"# {name}: fwd {res[f'{name}_fwd_ms']} "
              f"fwdbwd {res[f'{name}_fwdbwd_ms']}", file=sys.stderr)

    res["sum_stage_bwd_ms"] = round(sum(
        v for k, v in res.items()
        if k.endswith("_bwd_ms") and not k.startswith("full_decode")
        and k != "sum_stage_bwd_ms"), 2)
    res.update(batch=b, seconds=cli.seconds, k_amortize=k_amort,
               decoder=cli.decoder, device=str(jax.devices()[0]),
               fetch_floor_ms=round(fetch_floor() * 1e3, 3))
    line = json.dumps(res)
    print(line)
    if cli.out:
        with open(cli.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
