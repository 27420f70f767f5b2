"""Time-axis sharding of the sample-wise IIR scan.

The north-star scaling story (SURVEY.md §2.5): shard the *time* axis of the
synthesis chain across chips. The all-pole recurrence carries an order-p
boundary state chip-to-chip; because the system is linear, each device
summarizes its whole chunk as an affine map s_out = M s_in + v (p x p — a
few hundred floats), one tiny ``all_gather`` moves every summary to every
device (ICI), each device composes its prefix locally, and a second local
pass applies the true incoming state. Communication is O(p^2) per device
regardless of T — the scan itself never crosses chips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.allpole import _allpole_blocked, _allpole_impl, _choose_block


def _local_summary(x: jax.Array, a: jax.Array, block_size: int):
    """Affine summary (M, v) of a full local chunk (delegates to
    ``seqpar._local_affine_summary``, which picks a block length that
    divides the chunk — zero-padding would corrupt the end-state map)."""
    from .seqpar import _local_affine_summary
    return _local_affine_summary(x, a, block_size)


def _allpole_timesharded_fwd_impl(x: jax.Array, a: jax.Array, mesh: Mesh,
                                  time_axis: str = "time",
                                  block_size: Optional[int] = None
                                  ) -> jax.Array:
    """Forward time-sharded all-pole filter. x: (B, T) with T divisible by
    the mesh's time-axis size; a: (B, T, p)."""
    p = a.shape[-1]
    n_shards = mesh.shape[time_axis]
    t_local = x.shape[1] // n_shards
    bs = block_size or _choose_block(t_local)

    def local_fn(x_blk, a_blk):
        # x_blk: (B, T/n), a_blk: (B, T/n, p)
        m_dev, v_dev = _local_summary(x_blk, a_blk, bs)
        # gather every device's summary (tiny: p*(p+1) floats each)
        m_all = lax.all_gather(m_dev, time_axis)     # (n, B, p, p)
        v_all = lax.all_gather(v_dev, time_axis)
        idx = lax.axis_index(time_axis)

        def compose(carry, mv):
            m, v = mv
            new = (jnp.einsum("bij,bj->bi", m, carry) + v)
            return new, carry

        # prefix: incoming state of shard k = composition of shards < k
        zi0 = lax.pcast(jnp.zeros((x_blk.shape[0], p), x_blk.dtype),
                        (time_axis,), to="varying")
        _, prefixes = lax.scan(compose, zi0, (m_all, v_all))
        s_in = prefixes[idx]
        return _allpole_impl(x_blk, a_blk, s_in, bs)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, time_axis), P(None, time_axis, None)),
        out_specs=P(None, time_axis),
        check_vma=False)
    return fn(x.astype(jnp.float32), a.astype(jnp.float32))


def allpole_timesharded(x: jax.Array, a: jax.Array, mesh: Mesh,
                        time_axis: str = "time",
                        block_size: Optional[int] = None) -> jax.Array:
    """Differentiable time-sharded all-pole filter.

    Backward uses the same O(T) adjoint as the single-chip kernel
    (``ops/allpole.py``): the cotangent is filtered time-reversed through
    the sharded forward with column-shifted coefficients, so gradients
    also scale across the time axis. The coefficient shift/flip are plain
    global ops — XLA inserts the (p-sample halo) resharding.
    """
    return _allpole_ts_vjp(x, a, mesh, time_axis, block_size)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _allpole_ts_vjp(x, a, mesh, time_axis, block_size):
    return _allpole_timesharded_fwd_impl(x, a, mesh, time_axis, block_size)


def _ts_fwd(x, a, mesh, time_axis, block_size):
    y = _allpole_ts_vjp(x, a, mesh, time_axis, block_size)
    return y, (y, a)


def _ts_bwd(mesh, time_axis, block_size, res, g):
    from ..ops.allpole import _delayed_stack, _shift_columns
    y, a = res
    c = _shift_columns(a)
    dx = jnp.flip(
        _allpole_timesharded_fwd_impl(
            jnp.flip(g, 1), jnp.flip(c, 1), mesh, time_axis, block_size), 1)
    da = -dx[..., None] * _delayed_stack(y, a.shape[-1])
    return dx, da


_allpole_ts_vjp.defvjp(_ts_fwd, _ts_bwd)
