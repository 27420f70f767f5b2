#!/usr/bin/env python
"""On-chip parity + timing of the Pallas one-hot-matmul wavetable lookup
vs the XLA gather path, at the bench source shapes (B=1, T_os=576000,
hop_os=9600, S=2048)."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session  # noqa: E402

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
    from golf_tpu.models.synth import _lookup_blocks, _lookup_blocks_jnp
    from golf_tpu.utils.timing import amortized_ms, fetch_floor_ms

    r = np.random.default_rng(0)
    b, hop, s = 1, 9600, 2048
    blocks = 576000 // hop
    ph = jnp.asarray(r.random((b, blocks, hop), np.float32))
    tabs = jnp.asarray(
        r.standard_normal((b, blocks + 1, s)).astype(np.float32))

    res = {"floor_ms": round(fetch_floor_ms(), 4)}
    a = jax.jit(lambda p_, t_: _lookup_blocks_jnp(p_, t_, hop))(ph, tabs)
    p = jax.jit(lambda p_, t_: _lookup_blocks(p_, t_, hop))(ph, tabs)
    res["max_err"] = float(jnp.abs(a - p).max())
    res["gather_ms"] = amortized_ms(
        lambda p_, t_: _lookup_blocks_jnp(p_, t_, hop), ph, tabs)
    res["pallas_ms"] = amortized_ms(
        lambda p_, t_: _lookup_blocks(p_, t_, hop), ph, tabs)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
