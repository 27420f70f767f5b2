#!/usr/bin/env python
"""Micro-profile of the oversampled wavetable source path internals
(the 30 ms stage found by tools/synth_profile.py): wrapped cumsum,
bilinear table lookup, decimation — each K-amortized with distinct
inputs (see synth_profile.py for why distinct inputs are required).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from golf_tpu.models.synth import _bilinear_table_lookup
    from golf_tpu.ops.dsp import wrapped_cumsum
    from golf_tpu.ops.resample import decimate

    k_amort = 8
    sr, seconds = 24000, 6.0
    t = int(sr * seconds)
    os_k = 4
    t_os = (t - 1) * os_k + 1
    hop_os = 2400 * os_k
    blocks = -(-t_os // hop_os)
    s_cols = 2048  # wavetable row length (cfg/ae/decoder/golf.yaml points: 2048)
    r = np.random.default_rng(0)

    phase_step = jnp.full((1, t_os), 180.0 / sr / os_k, jnp.float32)
    wrapped = jnp.asarray(r.random((1, t_os), np.float32))
    tables = jnp.asarray(r.standard_normal((1, blocks + 1, s_cols)).astype(np.float32))
    big = jnp.asarray(r.standard_normal((1, t_os)).astype(np.float32))

    def amortize(f, *args):
        stacked = jax.tree_util.tree_map(
            lambda a: jnp.stack([a * (1.0 + 0.01 * i) for i in range(k_amort)]),
            list(args))

        def k_fn(xs):
            def step(c, leaf):
                out = f(*leaf)
                tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))
                return c, tot
            _, ys = jax.lax.scan(step, 0.0, xs)
            return ys
        jf = jax.jit(k_fn)
        jax.block_until_ready(jf(stacked))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(stacked))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return round(ts[len(ts) // 2] / k_amort * 1e3, 3)

    res = {}
    res["wrapped_cumsum_ms"] = amortize(lambda x: wrapped_cumsum(x), phase_step)
    res["bilinear_lookup_ms"] = amortize(
        lambda w, tab: _bilinear_table_lookup(w % 1.0, tab, hop_os),
        wrapped, tables)
    res["decimate_ms"] = amortize(lambda x: decimate(x, os_k), big)
    res["t_os"] = t_os
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
