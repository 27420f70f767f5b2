#!/usr/bin/env python
"""Structural audit of the harm_source backward graph (CPU, no timing).

Builds the DownsampledIndexedGlottalFlowTable training-shape call, takes
value_and_grad, and histograms the closed jaxpr's primitives with their
largest operand shapes — a cheap way to spot backward bloat (scatter
ops, replayed gathers, oversized FFTs) without chip time.
"""
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from golf_tpu.core.sig import Sig
from golf_tpu.config.registry import instantiate, load_config


def audit(jaxpr, tag):
    counts = defaultdict(int)
    bigshapes = defaultdict(list)

    def walk(jx):
        for eqn in jx.eqns:
            nm = eqn.primitive.name
            counts[nm] += 1
            sz = 0
            shp = None
            for v in list(eqn.invars) + list(eqn.outvars):
                if hasattr(v, "aval") and hasattr(v.aval, "shape"):
                    n = int(np.prod(v.aval.shape)) if v.aval.shape else 1
                    if n > sz:
                        sz, shp = n, v.aval.shape
            bigshapes[nm].append((sz, shp, getattr(eqn, "params", {})))
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    inner = sub.jaxpr if hasattr(sub.jaxpr, "eqns") else sub
                    walk(inner if hasattr(inner, "eqns") else inner.jaxpr)

    walk(jaxpr.jaxpr)
    print(f"== {tag}")
    interesting = {"scatter", "scatter-add", "gather", "conv_general_dilated",
                   "fft", "while", "scan", "cumsum", "associative_scan",
                   "dot_general", "cumlogsumexp", "sort", "dynamic_slice",
                   "dynamic_update_slice", "select_n", "rem", "floor",
                   "integer_pow", "rsqrt", "pad", "reduce_window_sum"}
    for nm in sorted(counts, key=lambda k: -counts[k]):
        rows = sorted(bigshapes[nm], reverse=True, key=lambda r: r[0])[:3]
        if nm in interesting or rows[0][0] >= 32 * 192000:
            det = "; ".join(
                f"{s}{(' fft=' + str(p.get('fft_lengths'))) if nm == 'fft' else ''}"
                for _, s, p in rows)
            print(f"  {nm:>24} x{counts[nm]:<4} top shapes: {det}")


def main():
    sr = 24000
    t = sr * 2
    hop = 240
    frames = t // hop + 1
    b = 32

    cfg = load_config("cfg/ae/decoder/golf.yaml")["decoder"]
    osc_cfg = cfg["init_args"]["harm_oscillator"]
    osc = instantiate(osc_cfg)

    r = np.random.default_rng(0)
    h = Sig(jnp.asarray(r.standard_normal((b, frames, 64)).astype(np.float32)
                        * 0.1), hop)
    phase = Sig(jnp.full((b, t), 180.0 / sr), 1)

    variables = osc.init(jax.random.key(0), h, method=lambda m, x: m.ctrl(x))

    def fwd(vs, ph, hh):
        def run(m, p_, h_):
            (w,) = m.ctrl(h_)
            return m(p_, w).data
        return osc.apply(vs, ph, hh, method=run)

    def loss(vs, ph, hh):
        return jnp.sum(fwd(vs, ph, hh) ** 2)

    jx_f = jax.make_jaxpr(fwd)(variables, phase, h)
    audit(jx_f, "forward")
    jx_g = jax.make_jaxpr(
        jax.value_and_grad(loss, argnums=(0, 1, 2)))(variables, phase, h)
    audit(jx_g, "value_and_grad")


if __name__ == "__main__":
    main()
