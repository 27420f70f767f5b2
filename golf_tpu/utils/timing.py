"""Relay-honest device timing helpers (shared by bench.py / test_rtf.py /
tools/*).

Through the dev relay ``block_until_ready`` can acknowledge at ENQUEUE
(fast connection mode — docs/TPU_NOTES.md), so wall-clocking a blocked
dispatch measures the relay, not the chip. The only reliable bound is a
host FETCH of data that data-depends on the full computation. These
helpers implement the protocol bench.py settled on in round 3
(docs/BENCH.md "Relay-honest timing"):

- every timed repeat fetches a scalar reduced from the full output;
- a per-repeat jitter operand defeats executable/result caching;
- ``m_chain`` back-to-back dispatches amortize the per-dispatch floor
  (in-order device execution makes the last fetch an upper bound on all
  of them);
- ``dispatch_floor`` measures the relay's dispatch+fetch floor with the
  same protocol so callers can subtract it where amortization can't.

Mirrors the measurement intent of reference ``test_rtf.py:163-172``
(n timed runs, trimmed mean) with the fetch-forced twist required by
this environment.
"""

from __future__ import annotations

import time

import numpy as np


def timed_fetch(fn, *args, n: int = 7, m_chain: int = 1) -> float:
    """Trimmed-mean wall time of ``m_chain`` back-to-back dispatches of
    ``fn(*args, jitter)`` ending in a host fetch of the last result.

    ``fn`` must accept a trailing float32 jitter scalar and return an
    array whose values depend on the full computation (e.g. a sum of the
    real output). Returns seconds per chain (divide by m_chain yourself).
    """
    import jax.numpy as jnp

    np.asarray(fn(*args, jnp.float32(0.0)))  # warm (compile + transfer)
    ts = []
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        outs = [fn(*args, jnp.float32((i * 31 + j) * 1e-9))
                for j in range(m_chain)]
        np.asarray(outs[-1])
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    if len(ts) > 2:
        ts = ts[1:-1]
    return sum(ts) / len(ts)


def dispatch_floor(n: int = 9) -> float:
    """Relay dispatch+fetch floor in seconds: a trivial cached
    executable timed with the same fetch protocol."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda a, j: a * 1.0000001 + j)
    x = jnp.float32(1.0)
    return timed_fetch(lambda j: tiny(x, j), n=n)


def fetch_scalar_wrap(fn):
    """Wrap ``fn(*args)`` (returning any pytree) into
    ``g(*args, jitter)`` returning one fetchable scalar that
    data-depends on every inexact leaf of the output. The jitter is
    added to the FIRST inexact array leaf of args (defeating caching
    without changing timing-relevant shapes)."""
    import jax
    import jax.numpy as jnp

    def g(*args_and_jitter):
        *args, jitter = args_and_jitter

        def add_first(tree):
            done = [False]

            def f(leaf):
                if (not done[0] and hasattr(leaf, "dtype")
                        and jnp.issubdtype(leaf.dtype, jnp.inexact)):
                    done[0] = True
                    return leaf + jitter.astype(leaf.dtype)
                return leaf
            return jax.tree_util.tree_map(f, tree)

        out = fn(*add_first(args))
        leaves = [jnp.sum(l, dtype=jnp.float32)
                  for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")
                  and jnp.issubdtype(l.dtype, jnp.inexact)]
        return sum(leaves) if leaves else jnp.float32(0.0)
    return g
