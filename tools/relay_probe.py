#!/usr/bin/env python
"""Relay COMPUTE liveness probe: exits 0 only if a trivial jitted
computation round-trips on the TPU within the deadline. jax.devices()
alone is not a liveness signal — the relay's metadata service can
respond while its compile/execute service is down (observed 2026-08-20:
devices() fine, every compute dispatch hung indefinitely)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session  # noqa: E402

ensure_fixed_session("golf-tpu-bench")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    v = float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 8))))
    assert v == 128.0, v
    print("relay compute OK")


if __name__ == "__main__":
    main()
