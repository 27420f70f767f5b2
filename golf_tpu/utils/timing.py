"""Relay-honest on-chip timing helpers.

Through the dev relay ``block_until_ready`` can acknowledge at ENQUEUE
(fast connection mode), so wall time around it measures the relay, not
the chip. The only sound protocol (STATUS.md round-3 lessons):

- K-amortize the op inside one ``lax.scan`` over K *distinct* stacked
  inputs (a loop-invariant pure stage is hoisted out by XLA CSE and the
  loop times nothing);
- FETCH a scalar that data-depends on the full computation each repeat;
- jitter one operand per repeat to defeat executable/result caching;
- subtract the trivial dispatch+fetch floor.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

_floor = [None]


def fetch_floor_ms() -> float:
    """Median wall ms of a trivial jitted dispatch+fetch (the relay floor)."""
    if _floor[0] is None:
        tiny = jax.jit(lambda a: a * 1.0000001 + 1.0)
        float(tiny(jnp.float32(0.0)))
        fs = []
        for i in range(9):
            t0 = time.perf_counter()
            float(tiny(jnp.float32(i)))
            fs.append(time.perf_counter() - t0)
        fs.sort()
        _floor[0] = fs[len(fs) // 2]
    return _floor[0] * 1e3


def amortized_ms(f, *args, k: int = 8, reps: int = 5) -> float:
    """Floor-corrected device ms per call of ``f(*args)``, K-amortized."""
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.stack([a * (1.0 + 0.01 * i) for i in range(k)]),
        list(args))

    def k_fn(xs, jitter):
        def step(c, leaf):
            out = f(*leaf)
            tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))
            return c, tot + jitter
        _, ys = jax.lax.scan(step, 0.0, xs)
        return ys

    jf = jax.jit(k_fn)
    np.asarray(jf(stacked, jnp.float32(0.0)))
    floor = fetch_floor_ms() / 1e3
    ts = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        np.asarray(jf(stacked, jnp.float32(i * 1e-7)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(max(ts[len(ts) // 2] - floor, 1e-7) / k * 1e3, 3)
