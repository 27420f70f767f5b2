#!/usr/bin/env python
"""Per-stage on-chip profile of the bench synthesis chain (GOLF-ss,
golf-precise, 6 s @ 24 kHz, B=1). Times each decoder stage as its own
jitted callable (K-amortized to cancel the relay dispatch floor) so the
33 ms/clip steady-state number can be attributed.

Stages: ctrl transforms, wavetable source (4x oversampled + decimate),
noise gen + zero-phase FIR, order-22 sample-wise all-pole, LTI room
filter, and the full chain.
"""
import json
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-bench")


def main():
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

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--k_amort", type=int, default=8)
    ap.add_argument("--decoder", default="cfg/ae/decoder/golf-precise.yaml")
    cli = ap.parse_args()

    sr, seconds = 24000, cli.seconds
    t = int(sr * seconds)
    hop = 240
    frames = t // hop + 1
    b = cli.batch
    k_amort = cli.k_amort

    decoder_cfg = load_config(cli.decoder)["decoder"]
    decoder = instantiate(decoder_cfg)

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

    def body(mdl, method_name, *args):
        return getattr(mdl, method_name)(*args)

    var_shapes = jax.eval_shape(
        lambda ph, rw: decoder.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            ph, rw, method=lambda m, p_, r_: m(p_, **m.apply_ctrl(r_))),
        phase, raw)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)

    def apply(vs, fn, *args):
        # vs passed through (not closed over): closure arrays embed as
        # jit constants, and a constant wavetable triggers a pathological
        # XLA gather lowering (see models/synth.py GlottalFlowTable).
        return decoder.apply(vs, *args,
                             rngs={"noise": jax.random.key(2)}, method=fn)

    # Stage callables, K-amortized via lax.scan over K *distinct* stacked
    # inputs. Distinct inputs are essential: a pure stage applied to
    # loop-invariant operands is hoisted out of the scan by XLA CSE and
    # the loop times nothing (this exact artifact produced impossible
    # sub-ms numbers in the first dispatch-table sweep). Each timed
    # repeat FETCHES the scalar results: through the dev relay
    # ``block_until_ready`` can acknowledge at enqueue, so only a host
    # read of data depending on the full computation bounds device time;
    # a per-repeat jitter operand defeats executable/result caching, and
    # the trivial dispatch+fetch floor is subtracted.
    _floor = [None]
    _tiny = [None]
    _floor_log = []

    def fetch_floor(refresh=False):
        # INTERLEAVED floor protocol (round-4 weak #6/#8: the relay floor
        # drifted 25->38 ms mid-run and inverted sum_stages vs chain):
        # re-measure immediately before each stage timing and subtract
        # the stage's own floor, not a run-global constant.
        if _floor[0] is None or refresh:
            if _tiny[0] is None:
                _tiny[0] = jax.jit(lambda a: a * 1.0000001 + 1.0)
                float(_tiny[0](jnp.float32(0.0)))
            fs = []
            for i in range(7):
                t0 = time.perf_counter()
                float(_tiny[0](jnp.float32(len(_floor_log) * 100 + i)))
                fs.append(time.perf_counter() - t0)
            fs.sort()
            _floor[0] = fs[len(fs) // 2]
            _floor_log.append(round(_floor[0] * 1e3, 3))
        return _floor[0]

    def amortize(f, *args):
        stacked = jax.tree_util.tree_map(
            lambda a: jnp.stack(
                [a * (1.0 + 0.01 * i) for i in range(k_amort)]),
            list(args))

        def k_fn(xs, jitter):
            def step(c, leaf):
                out = f(*leaf)
                tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))
                return c, tot + jitter
            _, ys = jax.lax.scan(step, 0.0, xs)
            return ys

        jf = jax.jit(k_fn)
        np.asarray(jf(stacked, jnp.float32(0.0)))
        floor = fetch_floor(refresh=True)   # per-stage floor (interleaved)
        ts = []
        for i in range(1, 6):
            t0 = time.perf_counter()
            np.asarray(jf(stacked, jnp.float32(i * 1e-7)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return max(ts[len(ts) // 2] - floor, 1e-7) / k_amort * 1e3

    # precompute ctrl + stage inputs (host-side shapes only once)
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

    res = {}
    res["ctrl_ms"] = amortize(
        lambda vs, rw: apply(vs, lambda m, r_: m.apply_ctrl(r_), rw),
        variables, raw)
    res["harm_source_ms"] = amortize(
        lambda vs, ph, c: apply(
            vs, lambda m, p_, c_: m.harm_oscillator(
                p_, *c_["harm_oscillator_params"]).data, ph, c),
        variables, phase, ctrl)
    res["noise_gen_ms"] = amortize(
        lambda vs, h, c: apply(
            vs, lambda m, h_, c_: m.noise_generator(
                h_, *c_["noise_generator_params"]).data, h, c),
        variables, harm, ctrl)
    res["noise_filter_ms"] = amortize(
        lambda vs, n, c: apply(
            vs, lambda m, n_, c_: m.noise_filter(
                n_, *c_["noise_filter_params"]).data, n, c),
        variables, noise, ctrl)
    res["allpole_ms"] = amortize(
        lambda vs, s, c: apply(
            vs, lambda m, s_, c_: m.end_filter(
                s_, *c_["end_filter_params"]).data, s, c),
        variables, src, ctrl)
    res["room_ms"] = amortize(
        lambda vs, y, c: apply(
            vs, lambda m, y_, c_: m.room_filter(
                y_, *c_["room_filter_params"]).data, y, c),
        variables, ef, ctrl)
    res["full_chain_ms"] = amortize(
        lambda vs, ph, rw: apply(
            vs, lambda m, p_, r_: m(p_, **m.apply_ctrl(r_)).data, ph, rw),
        variables, phase, raw)
    res["sum_stages_ms"] = round(sum(
        v for k, v in res.items() if k.endswith("_ms")
        and k not in ("full_chain_ms", "sum_stages_ms")), 3)
    res = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in res.items()}
    res["device"] = str(jax.devices()[0])
    res["fetch_floor_ms"] = round(fetch_floor() * 1e3, 4)
    res["floor_log_ms"] = _floor_log
    res["k_amortize"] = k_amort
    res["batch"] = b
    res["seconds"] = seconds
    res["decoder"] = cli.decoder
    print(json.dumps(res))


if __name__ == "__main__":
    main()
