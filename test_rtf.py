#!/usr/bin/env python
"""Real-time-factor benchmark (reference ``test_rtf.py``).

Times analysis (encoder) and synthesis (decoder) separately over n runs of
a 6 s clip, drops min/max, reports RTF = time / duration.

Usage:
    python test_rtf.py --config runs/<run>/config.yaml \
        [--ckpt runs/<run>/ckpt/last] [--wav path.wav] [--num 10] [--cpu]
"""

from __future__ import annotations

import argparse

import numpy as np

from golf_tpu.utils.axon_boot import ensure_fixed_session
ensure_fixed_session("golf-tpu-bench")


def bench(fn, args, n: int = 10):
    """n timed runs, trimmed mean (reference ``test_rtf.py:163-172``),
    RELAY-HONEST: each repeat fetches a scalar that data-depends on the
    full output with a jittered operand (through the dev relay,
    ``block_until_ready`` can acknowledge at enqueue — see
    golf_tpu/utils/timing.py / docs/BENCH.md "Relay-honest timing")."""
    import jax

    from golf_tpu.utils.timing import fetch_scalar_wrap, timed_fetch
    return timed_fetch(jax.jit(fetch_scalar_wrap(fn)), *args, n=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--wav", default=None)
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--num", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (reference defaults to CPU; TPU is the "
                         "default here)")
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from golf_tpu.config.registry import load_config
    from golf_tpu.core.sig import Sig
    from golf_tpu.tasks.cli import build_from_config

    cfg = load_config(args.config)
    task, _, _ = build_from_config(cfg)
    sr = cfg.get("model", {}).get("init_args", {}).get("sample_rate", 24000)
    t = int(args.duration * sr)

    if args.wav:
        from golf_tpu.utils.wav import read_wav
        x_np, file_sr = read_wav(args.wav)
        assert file_sr == sr, (file_sr, sr)
        x_np = x_np.reshape(-1)[:t].astype(np.float32)
        x_np = np.pad(x_np, (0, t - len(x_np)))
    else:
        x_np = (np.random.default_rng(0).standard_normal(t) * 0.1
                ).astype(np.float32)
    f0_np = np.full((1, t), 180.0, np.float32)
    x = Sig(jnp.asarray(x_np[None]), 1)
    f0 = Sig(jnp.asarray(f0_np), 1)

    variables = jax.jit(lambda xs, f0s: task.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        xs, f0s, train=True,
        method=lambda m, *a, **k: m.training_step(*a, **k)))(x, f0)
    if args.ckpt:
        from golf_tpu.train.checkpoint import load_checkpoint_variables
        restored = load_checkpoint_variables(args.ckpt, dict(variables))
        variables = {**variables, **restored}

    rngs = {"noise": jax.random.key(3), "dropout": jax.random.key(4)}

    # variables are jit ARGUMENTS (closure arrays embed as constants; a
    # constant glottal wavetable triggers a pathological XLA lowering of
    # the bilinear lookup — see models/synth.py GlottalFlowTable)
    @jax.jit
    def analysis(vs, x, f0):
        return task.apply(vs, x, f0=f0, train=False, rngs=rngs,
                          method=lambda m, *a, **k: m.encoder(*a, **k))

    params = analysis(variables, x, f0)

    @jax.jit
    def synthesis(vs, params, phase):
        def body(mdl, params, phase):
            p = mdl.decoder.apply_ctrl(params)
            p["phase"] = phase
            return mdl.decoder(**p)
        return task.apply(vs, params, phase, rngs=rngs, method=body)

    phase = Sig(jnp.asarray(f0_np) / sr, 1)
    raw = {k: v for k, v in params.items() if k.endswith("_params")}

    from golf_tpu.utils.timing import dispatch_floor
    t_floor = dispatch_floor()
    t_analysis = bench(analysis, (variables, x, f0), args.num)
    t_synthesis = bench(synthesis, (variables, raw, phase), args.num)

    print(f"device: {jax.devices()[0]}  "
          f"(dispatch+fetch floor {t_floor*1000:.2f} ms)")
    for name, tt in (("analysis ", t_analysis), ("synthesis", t_synthesis)):
        td = max(tt - t_floor, 1e-6)  # floor-corrected device time
        print(f"{name}: {tt*1000:8.2f} ms  "
              f"RTF {tt/args.duration:.5f}  "
              f"({args.duration/tt:8.1f}x realtime)  "
              f"[floor-corrected {td*1000:.2f} ms = "
              f"{args.duration/td:.0f}x RT]")


if __name__ == "__main__":
    main()
