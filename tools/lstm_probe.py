#!/usr/bin/env python
"""On-chip probe: flax nn.RNN(OptimizedLSTMCell) vs the fused LSTM
(models/rnn.py) at the encoder's training shape, across unroll factors.

Shape: B=32, T=200 frames (2 s at hop 240), 512-in -> 256-hidden — one
BiLSTM layer's fwd direction, fwd and fwd+bwd. Decides the unroll default
and documents the fused-kernel win.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-bench")


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    from golf_tpu.models.rnn import FusedLSTMDir
    from golf_tpu.utils.timing import timed_fetch, fetch_scalar_wrap

    b, t, c_in, h = 32, 200, 512, 256
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((b, t, c_in)).astype(np.float32))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, xs):
            return nn.RNN(nn.OptimizedLSTMCell(h))(xs)

    cases = {"flax_rnn": Ref()}
    for u in (1, 4, 8, 16):
        cases[f"fused_u{u}"] = FusedLSTMDir(h, unroll=u)

    out = {}
    for name, m in cases.items():
        v = m.init(jax.random.key(0), x)

        def fwd(params, xs):
            return jnp.sum(m.apply(params, xs))

        def fwdbwd(params, xs):
            val, g = jax.value_and_grad(fwd, argnums=(0, 1))(params, xs)
            return val + sum(jnp.sum(l) for l in
                             jax.tree_util.tree_leaves(g))

        f_ms = timed_fetch(fetch_scalar_wrap(jax.jit(fwd)), v, x) * 1e3
        fb_ms = timed_fetch(fetch_scalar_wrap(jax.jit(fwdbwd)), v, x) * 1e3
        out[name] = {"fwd_ms": round(f_ms, 3), "fwdbwd_ms": round(fb_ms, 3)}
        print(f"# {name}: fwd {f_ms:.3f} ms  fwd+bwd {fb_ms:.3f} ms",
              file=sys.stderr)

    print(json.dumps({"shape": [b, t, c_in, h], **out}))


if __name__ == "__main__":
    main()
