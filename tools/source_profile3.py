#!/usr/bin/env python
"""Relay-honest cumulative ablation of the oversampled wavetable source
(the 26.3 ms of the 32.4 ms serving chain, tools/synth_profile.py).

Fixes vs source_profile2.py: the glottal table is a jit ARGUMENT (a
closure constant triggers the pathological XLA gather lowering —
STATUS.md env lessons), every timed repeat FETCHES a scalar that depends
on the full computation, operands are jittered per repeat, and the
dispatch+fetch floor is subtracted. Also times candidate decimators:
the current pow2 full-FFT, a 5-smooth full-FFT, and a polyphase-FFT
realization (q phase convs at the DECIMATED rate + one small irfft).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
    from golf_tpu.models.filters import _smooth_fft_size
    from golf_tpu.models.synth import _bilinear_table_lookup
    from golf_tpu.ops.dsp import wrapped_cumsum
    from golf_tpu.ops.lf import build_glottal_table
    from golf_tpu.ops.resample import decimate_fft, decimate_poly_fft, \
        sinc_kernel
    from golf_tpu.utils.timing import amortized_ms, fetch_floor_ms

    k_amort = 8
    sr, t = 24000, 144000
    os_k = 4
    hop_coarse = 2400
    hop_os = hop_coarse * os_k
    r = np.random.default_rng(0)

    table = jnp.asarray(build_glottal_table(points=2048))  # (100, 2048)
    phase = jnp.full((1, t), 180.0 / sr, jnp.float32)
    weight = jnp.asarray(r.random((1, 61), np.float32))

    def interp_tables(tab, w):
        n = tab.shape[0]
        raw = w * (n - 1)
        fl = jnp.clip(raw.astype(jnp.int32), 0, n - 2)
        p = (raw - fl)[..., None]
        return tab[fl] * (1 - p) + tab[fl + 1] * p

    def upsample(ph):
        return linear_upsample(ph / os_k, os_k, axis=1)

    def stage_a(tab, ph, w):
        return upsample(ph)

    def stage_b(tab, ph, w):
        return wrapped_cumsum(upsample(ph))

    def stage_c(tab, ph, w):
        tabs = interp_tables(tab, w)
        return _bilinear_table_lookup(wrapped_cumsum(upsample(ph)), tabs,
                                      hop_os)

    def stage_d(tab, ph, w):
        tabs = interp_tables(tab, w)
        up = upsample(ph)
        y = _bilinear_table_lookup(wrapped_cumsum(up), tabs, hop_os)
        return y * jax.lax.rsqrt(up)

    def stage_e(tab, ph, w):
        return decimate_fft(stage_d(tab, ph, w), os_k)

    def stage_e_poly(tab, ph, w):
        return decimate_poly_fft(stage_d(tab, ph, w), os_k)

    xos = jnp.asarray(r.standard_normal((1, t * os_k)).astype(np.float32))

    res = {}
    res["floor_ms"] = round(fetch_floor_ms(), 4)
    res["a_upsample_ms"] = amortized_ms(stage_a, table, phase, weight,
                                        k=k_amort)
    res["b_plus_cumsum_ms"] = amortized_ms(stage_b, table, phase, weight,
                                           k=k_amort)
    res["c_plus_lookup_ms"] = amortized_ms(stage_c, table, phase, weight,
                                           k=k_amort)
    res["d_plus_rsqrt_ms"] = amortized_ms(stage_d, table, phase, weight,
                                          k=k_amort)
    res["e_full_pow2fft_ms"] = amortized_ms(stage_e, table, phase, weight,
                                            k=k_amort)
    res["e_full_polyfft_ms"] = amortized_ms(stage_e_poly, table, phase,
                                            weight, k=k_amort)
    # isolated decimators on the oversampled length
    res["dec_pow2_ms"] = amortized_ms(
        lambda x: decimate_fft(x, os_k), xos, k=k_amort)
    res["dec_poly_ms"] = amortized_ms(
        lambda x: decimate_poly_fft(x, os_k), xos, k=k_amort)
    # isolated cumsum on the oversampled length
    res["cumsum_os_ms"] = amortized_ms(
        lambda x: wrapped_cumsum(x * 1e-6), xos, k=k_amort)
    # parity check of the polyphase decimator (exactness, not timing)
    ref = np.asarray(decimate_fft(xos[:, :40000], os_k))
    alt = np.asarray(decimate_poly_fft(xos[:, :40000], os_k))
    res["poly_max_err"] = float(np.abs(ref - alt).max())
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
