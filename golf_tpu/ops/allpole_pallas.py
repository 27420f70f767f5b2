"""Pallas TPU kernel for the sample-wise time-varying all-pole recurrence.

    y[n] = x[n] - sum_{i=1..p} a_i[n] * y[n-i]

Layout: batch on the 128-wide lane axis, filter order on sublanes, time
streamed through VMEM in chunks by the Pallas pipeline. The carried state
is a (p_pad, B) VMEM scratch that persists across sequential grid steps;
each time step is one fused multiply + sublane-reduce + roll on the VPU.

This is the large-batch training backend: per step it does exactly p MACs
per sequence (the blocked XLA formulation in ``allpole.py`` does ~(p+2)x
that to expose parallelism — the right trade at small batch, the wrong one
when the batch already fills the lanes). The custom VJP in ``allpole.py``
reuses whichever forward backend is selected, since the adjoint is itself
an all-pole filter run time-reversed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, a_ref, o_ref, state, *, tb: int, p_pad: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    def body(t, _):
        a_t = a_ref[t]                       # (p_pad, B)
        s = state[:]                         # (p_pad, B)
        y = x_ref[t] - jnp.sum(a_t * s, axis=0)     # (B,)
        o_ref[t, :] = y
        rolled = pltpu.roll(s, 1, 0)
        # row-0 <- y without scatter (unsupported in Mosaic): iota mask
        row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        state[:] = jnp.where(row_ids == 0, y[None, :], rolled)
        return 0

    jax.lax.fori_loop(0, tb, body, 0)


def allpole_pallas(x: jax.Array, a: jax.Array, time_block: int = 256,
                   interpret: bool = False) -> jax.Array:
    """x: (B, T), a: (B, T, p) -> (B, T). fp32."""
    b, t = x.shape
    p = a.shape[-1]
    b_pad = _round_up(max(b, 1), 128)
    p_pad = _round_up(max(p, 1), 8)
    tb = min(time_block, _round_up(t, 8))
    t_pad = _round_up(t, tb)

    xt = jnp.zeros((t_pad, b_pad), jnp.float32)
    xt = xt.at[:t, :b].set(jnp.swapaxes(x, 0, 1).astype(jnp.float32))
    at = jnp.zeros((t_pad, p_pad, b_pad), jnp.float32)
    at = at.at[:t, :p, :b].set(
        jnp.transpose(a, (1, 2, 0)).astype(jnp.float32))

    grid = (t_pad // tb,)
    out = pl.pallas_call(
        functools.partial(_kernel, tb=tb, p_pad=p_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, b_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, p_pad, b_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, b_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p_pad, b_pad), jnp.float32)],
        interpret=interpret,
    )(xt, at)
    return jnp.swapaxes(out[:t, :b], 0, 1)


def _const_kernel(a_ref, x_ref, o_ref, state, *, tb: int):
    j = pl.program_id(1)  # time-chunk index (inner, sequential)

    @pl.when(j == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    a = a_ref[:]                                 # (p_pad, B_tb)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)

    def body(t, _):
        s = state[:]
        y = x_ref[t] - jnp.sum(a * s, axis=0)
        o_ref[t, :] = y
        rolled = pltpu.roll(s, 1, 0)
        state[:] = jnp.where(row_ids == 0, y[None, :], rolled)
        return 0

    jax.lax.fori_loop(0, tb, body, 0)


def allpole_const_pallas(x: jax.Array, a: jax.Array,
                         time_block: int = 256, batch_block: int = 512,
                         interpret: bool = False) -> jax.Array:
    """Constant-coefficient all-pole: x (N, T), a (N, p) -> (N, T).

    Batch tiles on lanes (outer grid axis), time chunks inner (state
    persists across the sequential inner axis). The per-frame LPC
    synthesis path (GOLF-ff) has N = batch x frames in the thousands —
    lane-rich, so this wins big over the lax.scan formulation.
    """
    n, t = x.shape
    p = a.shape[-1]
    nb = _round_up(max(n, 1), 128)
    nb_tile = min(batch_block, nb)
    nb = _round_up(nb, nb_tile)
    p_pad = _round_up(max(p, 1), 8)
    tb = min(time_block, _round_up(t, 8))
    t_pad = _round_up(t, tb)

    xt = jnp.zeros((t_pad, nb), jnp.float32)
    xt = xt.at[:t, :n].set(jnp.swapaxes(x, 0, 1).astype(jnp.float32))
    at = jnp.zeros((p_pad, nb), jnp.float32)
    at = at.at[:p, :n].set(jnp.swapaxes(a, 0, 1).astype(jnp.float32))

    grid = (nb // nb_tile, t_pad // tb)
    out = pl.pallas_call(
        functools.partial(_const_kernel, tb=tb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, nb_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, nb_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, nb_tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, nb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p_pad, nb_tile), jnp.float32)],
        interpret=interpret,
    )(at, xt)
    return jnp.swapaxes(out[:t, :n], 0, 1)
