#!/usr/bin/env python
"""On-chip FFT-size probe: is a snug 5-smooth rfft/irfft pair faster than
the next power of two on this TPU toolchain?

`models/filters.py::_fft_frame_conv` currently rounds L+K-1 up to a power
of two (e.g. 1199 -> 2048, 71% padding). XLA TPU FFT may either handle
5-smooth sizes (1200 = 2^4*3*5^2) natively — in which case snug sizes cut
the FFT work — or fall back to Bluestein (which would make them SLOWER
than pow2). Measure, don't guess (VERDICT r2 #2 candidate).

Timing is relay-honest: fetch-forced, jittered operands, floor-corrected
(see tools/allpole_sweep.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session  # noqa: E402

ensure_fixed_session("golf-tpu-bench")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")

    tiny = jax.jit(lambda a: a * 1.0000001 + 1.0)
    float(tiny(jnp.float32(0.0)))
    fs = []
    for i in range(9):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(i)))
        fs.append(time.perf_counter() - t0)
    fs.sort()
    floor = fs[len(fs) // 2]

    def timed(f, x, n=5, k=8):
        xs = jnp.stack([x * (1.0 + 0.01 * i) for i in range(k)])

        def k_fn(xs, jit_):
            def step(c, leaf):
                return c, jnp.sum(f(leaf + jit_))
            _, ys = jax.lax.scan(step, 0.0, xs)
            return ys
        jf = jax.jit(k_fn)
        np.asarray(jf(xs, jnp.float32(0.0)))
        ts = []
        for i in range(1, n + 1):
            t0 = time.perf_counter()
            np.asarray(jf(xs, jnp.float32(i * 1e-7)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return max(ts[len(ts) // 2] - floor, 1e-7) / k

    rng = np.random.default_rng(0)
    # training frame-conv shape: B=32, 201 frames, conv length ~1199
    rows = 32 * 201
    out = {"floor_ms": round(floor * 1e3, 4), "rows": rows, "cases": []}
    for nfft in (1200, 1250, 1280, 1440, 1500, 1536, 2048, 4096):
        x = jnp.asarray(rng.standard_normal(
            (rows, nfft)).astype(np.float32))

        def pair(v):
            return jnp.fft.irfft(jnp.fft.rfft(v) * 1.0001, v.shape[-1])
        try:
            t = timed(pair, x) * 1e3
        except Exception as e:  # pragma: no cover
            print(f"# nfft={nfft} failed: {e}", file=sys.stderr)
            continue
        out["cases"].append({"nfft": nfft, "ms": round(t, 4),
                             "ms_per_kpoint": round(
                                 t / (rows * nfft) * 1e6, 5)})
        print(f"nfft={nfft:5d}  {t:8.3f} ms  "
              f"({t / (rows * nfft) * 1e6:.5f} ms/kpt)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
