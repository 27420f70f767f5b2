#!/usr/bin/env python
"""Cumulative ablation of the oversampled wavetable source chain, as pure
functions with the exact shapes of the bench harm stage. Finds which
composition step owns the 30 ms (tools/synth_profile.py attribution)."""
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
    from golf_tpu.core.sig import linear_upsample
    from golf_tpu.models.synth import _bilinear_table_lookup
    from golf_tpu.ops.dsp import wrapped_cumsum
    from golf_tpu.ops.lf import build_glottal_table
    from golf_tpu.ops.resample import decimate

    k_amort = 8
    sr, t = 24000, 144000
    os_k = 4
    hop_coarse = 2400
    hop_os = hop_coarse * os_k
    r = np.random.default_rng(0)

    table = jnp.asarray(build_glottal_table(points=2048))  # (100, 2048)
    phase = jnp.full((1, t), 180.0 / sr, jnp.float32)
    weight = jnp.asarray(r.random((1, 61), np.float32))

    def interp_tables(w):
        n = table.shape[0]
        raw = w * (n - 1)
        fl = jnp.clip(raw.astype(jnp.int32), 0, n - 2)
        p = (raw - fl)[..., None]
        return table[fl] * (1 - p) + table[fl + 1] * p

    def upsample(ph):
        return linear_upsample(ph / os_k, os_k, axis=1)

    def stage_a(ph, w):
        return upsample(ph)

    def stage_b(ph, w):
        return wrapped_cumsum(upsample(ph))

    def stage_c(ph, w):
        tabs = interp_tables(w)
        return _bilinear_table_lookup(wrapped_cumsum(upsample(ph)), tabs,
                                      hop_os)

    def stage_d(ph, w):
        tabs = interp_tables(w)
        up = upsample(ph)
        y = _bilinear_table_lookup(wrapped_cumsum(up), tabs, hop_os)
        return y * jax.lax.rsqrt(up)

    def stage_e(ph, w):
        tabs = interp_tables(w)
        up = upsample(ph)
        y = _bilinear_table_lookup(wrapped_cumsum(up), tabs, hop_os)
        return decimate(y * jax.lax.rsqrt(up), os_k)

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
    res["a_upsample_ms"] = amortize(stage_a, phase, weight)
    res["b_plus_cumsum_ms"] = amortize(stage_b, phase, weight)
    res["c_plus_lookup_ms"] = amortize(stage_c, phase, weight)
    res["d_plus_rsqrt_ms"] = amortize(stage_d, phase, weight)
    res["e_plus_decimate_ms"] = amortize(stage_e, phase, weight)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
