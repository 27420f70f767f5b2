#!/usr/bin/env python
"""Per-op TPU microbenchmark: compile time + runtime of each stage of the
GOLF-ss synthesis chain. Run on the real chip to find compile/runtime
hotspots (prints one line per op).

Usage: python tools/tpu_microbench.py [--ops op1,op2,...]
"""

import argparse
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session
ensure_fixed_session("golf-tpu-bench")



def timed_compile_run(name, fn, *args, n=5):
    import jax
    t0 = time.time()
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    t_run = (time.time() - t0) / n
    print(f"{name:28s} compile {t_compile:7.1f}s   run {t_run*1e3:8.3f} ms",
          flush=True)
    return t_run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="")
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    sel = set(args.ops.split(",")) if args.ops else None

    import jax
    import jax.numpy as jnp
    from golf_tpu.core.sig import Sig, linear_upsample
    from golf_tpu.ops.allpole import allpole, allpole_scan
    from golf_tpu.ops.allpole_pallas import allpole_pallas
    from golf_tpu.ops.dsp import rc2lpc
    from golf_tpu.ops.resample import decimate
    from golf_tpu.models.synth import _bilinear_table_lookup

    sr = 24000
    t = int(sr * args.seconds)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}; T={t}", flush=True)

    def want(name):
        return sel is None or name in sel

    x1 = jnp.asarray(rng.standard_normal((1, t)).astype(np.float32))

    if want("cumsum"):
        timed_compile_run("cumsum T*4", lambda x: jnp.cumsum(x, axis=1),
                          jnp.tile(x1, (1, 4)))
    if want("upsample"):
        fr = jnp.asarray(rng.standard_normal((1, t // 240 + 1, 22))
                         .astype(np.float32))
        timed_compile_run("linear_upsample 240x",
                          lambda a: linear_upsample(a, 240, axis=1), fr)
    if want("gather"):
        tables = jnp.asarray(rng.standard_normal((1, 2402, 2049))
                             .astype(np.float32))
        ph = jnp.asarray(rng.uniform(0, 1, (1, 4 * t)).astype(np.float32))
        timed_compile_run("bilinear_gather 4T",
                          lambda p, tb: _bilinear_table_lookup(p, tb, 960),
                          ph, tables)
    if want("decimate"):
        x4 = jnp.tile(x1, (1, 4))
        timed_compile_run("decimate q=4 (449 taps)",
                          lambda x: decimate(x, 4), x4)
    if want("rc2lpc"):
        rc = jnp.asarray(rng.standard_normal((1, t // 240 + 1, 22))
                         .astype(np.float32))
        timed_compile_run("rc2lpc p=22", lambda r: rc2lpc(jnp.tanh(r)), rc)
    if want("allpole"):
        a = np.asarray(rc2lpc(jnp.tanh(jnp.asarray(
            rng.standard_normal((1, t, 22)).astype(np.float32)) * 0.2)))
        timed_compile_run("allpole blocked p=22",
                          lambda x, a: allpole(x, a), x1, jnp.asarray(a))
    if want("pallas"):
        a = np.asarray(rc2lpc(jnp.tanh(jnp.asarray(
            rng.standard_normal((1, t, 22)).astype(np.float32)) * 0.2)))
        timed_compile_run("allpole pallas p=22",
                          lambda x, a: allpole_pallas(x, a),
                          x1, jnp.asarray(a))
    if want("fftconv"):
        from golf_tpu.models.filters import _fft_frame_conv, _unfold
        kern = jnp.asarray(rng.standard_normal((1, t // 240, 510))
                           .astype(np.float32))

        def zp(x, k):
            xp = jnp.pad(x, ((0, 0), (254, 254)))
            unf = _unfold(xp, 510 + 240 - 1, 240)
            f = min(unf.shape[1], k.shape[1])
            return _fft_frame_conv(unf[:, :f], k[:, :f], 240, True)
        timed_compile_run("zero-phase FFT frame conv", zp, x1, kern)


if __name__ == "__main__":
    main()
