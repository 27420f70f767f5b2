#!/usr/bin/env python
"""Headline benchmark: GOLF-ss sample-wise synthesis real-time factor.

Protocol mirrors the reference ``test_rtf.py`` (n runs of a 6 s clip,
min/max-trimmed mean, synthesis timed separately from analysis) on the real
TPU chip. North-star target (BASELINE.json): >100x real-time per chip.

Prints ONE JSON line:
    {"metric": "golf_ss_synthesis_xrt", "value": N, "unit": "x_realtime",
     "vs_baseline": N/100}
"""

import json
import sys
import time

import numpy as np

from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-bench")


def main():
    import jax
    # persistent compilation cache: the first compile of the full synthesis
    # graph through the remote-compile relay is minutes; cached reruns are
    # seconds.
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from golf_tpu.core.sig import Sig
    from golf_tpu.config.registry import instantiate, load_config
    from golf_tpu.ops.dsp import rc2lpc

    sr = 24000
    seconds = 6.0
    t = int(sr * seconds)
    n_runs = 10
    rng = np.random.default_rng(0)

    # GOLF-ss decoder (sample-wise precise end filter), full synthesis path
    decoder_cfg = load_config("cfg/ae/decoder/golf-precise.yaml")["decoder"]
    decoder = instantiate(decoder_cfg)

    b = 1
    hop = 240
    frames = t // hop + 1
    # realistic control parameters: raw logit groups, transformed by ctrl
    raw = {
        "harm_oscillator_params": (
            Sig(jnp.asarray(rng.standard_normal(
                (b, frames, 64)).astype(np.float32) * 0.1), hop),),
        "noise_generator_params": (),
        "noise_filter_params": (
            Sig(jnp.asarray(rng.standard_normal(
                (b, frames, 256)).astype(np.float32) * 0.1 - 3.0), hop),),
        "end_filter_params": (
            Sig(jnp.asarray(rng.standard_normal(
                (b, frames)).astype(np.float32) * 0.1), hop),
            Sig(jnp.asarray(rng.standard_normal(
                (b, frames, 22)).astype(np.float32) * 0.3), hop)),
        "room_filter_params": (),
    }
    f0 = np.full((b, t), 180.0, np.float32)
    phase = Sig(jnp.asarray(f0) / sr, 1)

    def body(mdl, phase, raw):
        # ctrl transforms + synthesis under one module scope
        params = mdl.apply_ctrl(raw)
        return mdl(phase, **params)

    # shape-only init: no compile, no device work. The GOLF-ss decoder's
    # only parameter is the acoustic-filter kernel, which is zero-init —
    # so zeros of the right shapes ARE the init values.
    var_shapes = jax.eval_shape(
        lambda ph, rw: decoder.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            ph, rw, method=body), phase, raw)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)

    def synth_full(phase, raw):
        return decoder.apply(variables, phase, raw,
                             rngs={"noise": jax.random.key(2)},
                             method=body).data

    jit_synth = jax.jit(synth_full)

    # warmup / compile
    out = jit_synth(phase, raw)
    out.block_until_ready()

    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out = jit_synth(phase, raw)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    times = sorted(times)[1:-1]
    mean_t = sum(times) / len(times)
    xrt = seconds / mean_t
    samples_per_sec = t / mean_t

    print(json.dumps({
        "metric": "golf_ss_synthesis_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 100.0, 3),
    }))
    print(f"# device={jax.devices()[0]}, mean={mean_t*1000:.2f} ms "
          f"for {seconds}s clip, {samples_per_sec/1e6:.2f} Msamples/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
