#!/usr/bin/env python
"""Backend-independent op census of the bench synthesis chain.

Traces the GOLF-ss `synth_one` callable (same construction as bench.py)
on the CPU backend and prints a histogram of StableHLO ops plus the
largest intermediate tensors — a cheap way to spot pathological stages
(giant gathers, unexpected convs, huge materializations) without chip
time.
"""
import collections
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from golf_tpu.core.sig import Sig
from golf_tpu.config.registry import instantiate, load_config


def main():
    sr, seconds = 24000, 6.0
    t = int(sr * seconds)
    hop = 240
    frames = t // hop + 1
    b = 1

    decoder_cfg = load_config("cfg/ae/decoder/golf-precise.yaml")["decoder"]
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

    def body(mdl, phase, raw):
        return mdl(phase, **mdl.apply_ctrl(raw))

    var_shapes = jax.eval_shape(
        lambda ph, rw: decoder.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            ph, rw, method=body), phase, raw)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)

    def synth_one(vs, ph, rw):
        # vs as argument, not closure (constant-wavetable XLA pathology;
        # see models/synth.py GlottalFlowTable)
        return decoder.apply(vs, ph, rw,
                             rngs={"noise": jax.random.key(2)},
                             method=body).data

    lowered = jax.jit(synth_one).lower(variables, phase, raw)
    txt = lowered.as_text()
    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"= \"?([\w.]+)\"?\(", txt))
    print("== op histogram (top 40) ==")
    for op, n in ops.most_common(40):
        print(f"{n:6d}  {op}")

    # largest tensor shapes appearing in the module
    shapes = collections.Counter(
        m.group(0) for m in re.finditer(r"tensor<[0-9x]+x?f32>", txt))
    def numel(s):
        dims = re.findall(r"\d+", s)
        out = 1
        for d in dims:
            out *= int(d)
        return out
    big = sorted(shapes.items(), key=lambda kv: -numel(kv[0]))[:15]
    print("\n== largest f32 tensor types (count x type) ==")
    for s, n in big:
        print(f"{n:6d}  {s}  ({numel(s)/1e6:.2f} M elems)")

    print(f"\ntotal ops: {sum(ops.values())}, module chars: {len(txt)}")


if __name__ == "__main__":
    main()
