"""Pallas TPU kernel for the blocked bilinear wavetable lookup.

The serving chain's hot spot (22.8 of 32.4 ms per 6 s clip,
tools/source_profile3.py) is the grid_sample-equivalent lookup in
``models/synth.py::_bilinear_table_lookup``: four ``take_along_axis``
gathers over the 2048-wide table axis, which XLA lowers to the slow
serial gather path (~10 ns/element on v5e).

TPU has no vector gather; the fast formulation is a ONE-HOT MATMUL kept
entirely in VMEM. Per hop-block every sample interpolates between the
same two table rows, so each tile handles one (batch, block, lane-tile):

  - build the transposed one-hot  oh[s, i] = (s == floor(phase_i * S))
    with a broadcasted iota compare (VPU, never touches HBM);
  - load the block's two table rows, lane-roll by -1 for the wraparound
    column, stack into a (4, S) matrix M;
  - vals = M @ oh  on the MXU -> (4, r): the four bilinear corners
    v00/v01/v10/v11 for the whole tile at once;
  - combine with the in-block column/row weights on the VPU.

Mosaic block-shape rules (last two dims 8/128-divisible or full) shape
the tiling: blocks are grouped in EIGHTS on the sublane axis (tab0/tab1
pre-sliced outside so the f and f+1 rows align per group), and the hop
axis is zero-padded to a multiple of 128 (padded lanes compute garbage
that the caller slices off; the rw row weight uses the REAL hop).

Exactness: the one-hot rows select single elements, so the fp32 matmul
(bf16 3-pass decomposition + fp32 accumulate) reproduces the gathered
values bit-exactly; the weight combine uses the same expressions as the
jnp path. The backward pass reuses the jnp formulation's VJP via
``jax.custom_vjp`` in models/synth.py (training gathers run once per
step, not per serve — never the bottleneck).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GROUP = 8           # blocks per tile (sublane-divisibility requirement)
_VMEM_BUDGET = 2 ** 23  # 8 MB for the (S, r) one-hot: S * r * 4 bytes
_MAX_R = 1024        # absolute lane-tile cap (at S=2048 it fills the budget)
_VMEM_BUDGET_BWD = 5 * 2 ** 20  # the adjoint's live set is ~2.7x the one-hot


def _kernel(ph_ref, tab0_ref, tab1_ref, o_ref, *, s: int, hop: int, r: int):
    sub = pl.program_id(2)
    lane0 = (sub * r).astype(jnp.float32)
    for j in range(_GROUP):
        ph = ph_ref[0, j, :]                           # (r,)
        col = ph * s
        c0f = jnp.clip(jnp.floor(col), 0, s - 1)
        c0 = c0f.astype(jnp.int32)
        cw = col - c0f

        tab0 = tab0_ref[0, j, :].reshape(1, s)
        tab1 = tab1_ref[0, j, :].reshape(1, s)
        # wraparound: column index c0+1 == S selects table[..., 0]
        m = jnp.concatenate(
            [tab0, pltpu.roll(tab0, s - 1, 1),
             tab1, pltpu.roll(tab1, s - 1, 1)], axis=0)      # (4, S)

        iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, r), 0)
        oh = (iota_s == c0[None, :]).astype(jnp.float32)     # (S, r)
        vals = jax.lax.dot_general(
            m, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (4, r)

        top = vals[0] * (1 - cw) + vals[1] * cw
        bot = vals[2] * (1 - cw) + vals[3] * cw
        rw = (lane0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, r), 1)[0].astype(jnp.float32)) * (1.0 / hop)
        o_ref[0, j, :] = top * (1 - rw) + bot * rw


def _bwd_dph_kernel(ph_ref, tab0_ref, tab1_ref, g_ref, dph_ref, *,
                    s: int, hop: int, r: int):
    """Phase half of the adjoint (same streaming pattern as the forward):
      d_ph = g * S * ((1-rw)(v01-v00) + rw(v11-v10))
    with the forward corner values recomputed via the forward dot."""
    sub = pl.program_id(2)
    lane0 = (sub * r).astype(jnp.float32)
    for j in range(_GROUP):
        ph = ph_ref[0, j, :]                           # (r,)
        col = ph * s
        c0f = jnp.clip(jnp.floor(col), 0, s - 1)
        c0 = c0f.astype(jnp.int32)
        g = g_ref[0, j, :]

        tab0 = tab0_ref[0, j, :].reshape(1, s)
        tab1 = tab1_ref[0, j, :].reshape(1, s)
        m = jnp.concatenate(
            [tab0, pltpu.roll(tab0, s - 1, 1),
             tab1, pltpu.roll(tab1, s - 1, 1)], axis=0)      # (4, S)

        iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, r), 0)
        oh = (iota_s == c0[None, :]).astype(jnp.float32)     # (S, r)
        vals = jax.lax.dot_general(
            m, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (4, r)

        rw = (lane0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, r), 1)[0].astype(jnp.float32)) * (1.0 / hop)
        dph_ref[0, j, :] = g * s * (
            (1 - rw) * (vals[1] - vals[0]) + rw * (vals[3] - vals[2]))


def _bwd_dtab_kernel(ph_ref, g_ref, dtab_ref, *, s: int, hop: int,
                     r: int):
    """Table half of the adjoint:
      d_tab0 = O @ (g(1-rw)(1-cw)) + O1 @ (g(1-rw)cw)
      d_tab1 = O @ (g rw (1-cw))   + O1 @ (g rw cw)
    with O the (S, r) c0 one-hot and O1 its +1-sublane roll (the c0+1
    mod S one-hot; rolling the dot RESULT is equivalent and cheaper than
    a second iota compare). Each lane tile writes its OWN output slice —
    [d_tab0 | d_tab1] lane-concatenated into one (.., 2S) output, summed
    over tiles outside the kernel: a single streamed output per grid
    step. (Revisited accumulator outputs and multi-output calls both
    made XLA pin whole d_tab arrays in scoped vmem and blow its 16 MB
    limit — measured 21.6/35.4 MB.)"""
    sub = pl.program_id(2)
    lane0 = (sub * r).astype(jnp.float32)
    for j in range(_GROUP):
        ph = ph_ref[0, j, :]                           # (r,)
        col = ph * s
        c0f = jnp.clip(jnp.floor(col), 0, s - 1)
        c0 = c0f.astype(jnp.int32)
        cw = col - c0f
        g = g_ref[0, j, :]
        rw = (lane0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, r), 1)[0].astype(jnp.float32)) * (1.0 / hop)

        iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, r), 0)
        oh = (iota_s == c0[None, :]).astype(jnp.float32)     # (S, r)
        w = jnp.stack([g * (1 - rw) * (1 - cw), g * (1 - rw) * cw,
                       g * rw * (1 - cw), g * rw * cw], axis=1)
        d = jax.lax.dot_general(
            oh, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (S, 4)
        rolled = pltpu.roll(d, 1, 0)
        dtab_ref[0, 0, j, :s] = d[:, 0] + rolled[:, 1]
        dtab_ref[0, 0, j, s:] = d[:, 2] + rolled[:, 3]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile(hop_pad: int, s: int,
               budget: int = _VMEM_BUDGET) -> int:
    """Largest 128-multiple divisor of hop_pad within the one-hot VMEM
    budget (S * r * 4 bytes <= budget) and _MAX_R."""
    r_cap = min(_MAX_R, budget // (4 * s))
    best = 0
    for r in range(128, r_cap + 1, 128):
        if hop_pad % r == 0:
            best = r
    return best


def bwd_supported(hop: int, s: int) -> bool:
    """Whether the Pallas adjoint fits its tighter VMEM budget."""
    return (lookup_supported(hop, s)
            and _pick_tile(_round_up(hop, 128), s, _VMEM_BUDGET_BWD) > 0)


def lookup_supported(hop: int, s: int) -> bool:
    # s must divide into 128-lane tiles AND leave room for at least the
    # minimal r=128 one-hot tile within the VMEM budget (an S >= 16384
    # table would otherwise pass the gate and overflow VMEM).
    return (s % 128 == 0 and hop >= 8
            and 128 <= _VMEM_BUDGET // (4 * s))


@functools.partial(jax.jit, static_argnums=(2, 3))
def bilinear_lookup_pallas(ph_blocks: jax.Array, tables: jax.Array,
                           hop: int, interpret: bool = False) -> jax.Array:
    """ph_blocks: (B, blocks, hop) wrapped phase in [0,1);
    tables: (B, blocks+1, S) edge-padded table rows (row f and f+1 bound
    block f). Returns (B, blocks, hop)."""
    b, blocks, hop_ = ph_blocks.shape
    assert hop_ == hop
    s = tables.shape[-1]
    assert tables.shape[1] >= blocks + 1, (tables.shape, blocks)
    interpret = interpret or jax.default_backend() == "cpu"

    hop_pad = _round_up(hop, 128)
    g_pad = _round_up(blocks, _GROUP)
    r = _pick_tile(hop_pad, s)
    ph = jnp.pad(ph_blocks.astype(jnp.float32),
                 ((0, 0), (0, g_pad - blocks), (0, hop_pad - hop)))
    tabs = tables.astype(jnp.float32)
    tab0 = jnp.pad(tabs[:, :blocks], ((0, 0), (0, g_pad - blocks), (0, 0)))
    tab1 = jnp.pad(tabs[:, 1:blocks + 1],
                   ((0, 0), (0, g_pad - blocks), (0, 0)))

    # A weighted-one-hot variant (interp weights inside the one-hot, 2 LHS
    # rows instead of 4) was measured SLOWER on-chip (3.21 vs 2.39 ms at
    # the bench shape, docs/results_r4/lookup_variant_probe.json): the
    # kernel is VPU-bound on the one-hot build, not MXU-bound, so the
    # halved dot does not pay for the second iota compare. Deleted.
    grid = (b, g_pad // _GROUP, hop_pad // r)
    out = pl.pallas_call(
        functools.partial(_kernel, s=s, hop=hop, r=r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _GROUP, r), lambda bi, g, sub: (bi, g, sub)),
            pl.BlockSpec((1, _GROUP, s), lambda bi, g, sub: (bi, g, 0)),
            pl.BlockSpec((1, _GROUP, s), lambda bi, g, sub: (bi, g, 0)),
        ],
        out_specs=pl.BlockSpec((1, _GROUP, r), lambda bi, g, sub: (bi, g, sub)),
        out_shape=jax.ShapeDtypeStruct((b, g_pad, hop_pad), jnp.float32),
        interpret=interpret,
    )(ph, tab0, tab1)
    return out[:, :blocks, :hop]


@functools.partial(jax.jit, static_argnums=(3, 4))
def bilinear_lookup_pallas_bwd(ph_blocks: jax.Array, tables: jax.Array,
                               g: jax.Array, hop: int,
                               interpret: bool = False):
    """Adjoint of :func:`bilinear_lookup_pallas`: cotangent ``g`` of the
    (B, blocks, hop) output -> (d_ph_blocks, d_tables). Replaces the
    round-3 VJP that replayed the SLOW jnp gather forward (measured
    ~500 ms at the B=32 training shape vs ~32 ms for the Pallas
    forward)."""
    b, blocks, hop_ = ph_blocks.shape
    assert hop_ == hop
    s = tables.shape[-1]
    interpret = interpret or jax.default_backend() == "cpu"

    hop_pad = _round_up(hop, 128)
    g_pad = _round_up(blocks, _GROUP)
    # the adjoint holds ~2.7x the forward's live VMEM (the one-hot plus
    # the second dot's operands/results) — a full-budget r=1024 tile
    # blows the 16 MB scoped-vmem limit (measured: 21.6 MB requested)
    r = _pick_tile(hop_pad, s, _VMEM_BUDGET_BWD)
    assert r > 0, (hop, s, "use bwd_supported() before calling")
    pad3 = ((0, 0), (0, g_pad - blocks), (0, hop_pad - hop))
    ph = jnp.pad(ph_blocks.astype(jnp.float32), pad3)
    gg = jnp.pad(g.astype(jnp.float32), pad3)  # zero-padded cotangent
    tabs = tables.astype(jnp.float32)
    tab0 = jnp.pad(tabs[:, :blocks], ((0, 0), (0, g_pad - blocks), (0, 0)))
    tab1 = jnp.pad(tabs[:, 1:blocks + 1],
                   ((0, 0), (0, g_pad - blocks), (0, 0)))

    n_sub = hop_pad // r
    grid = (b, g_pad // _GROUP, n_sub)
    spec_r = pl.BlockSpec((1, _GROUP, r), lambda bi, gi, sub: (bi, gi, sub))
    spec_s = pl.BlockSpec((1, _GROUP, s), lambda bi, gi, sub: (bi, gi, 0))
    dph = pl.pallas_call(
        functools.partial(_bwd_dph_kernel, s=s, hop=hop, r=r),
        grid=grid,
        in_specs=[spec_r, spec_s, spec_s, spec_r],
        out_specs=spec_r,
        out_shape=jax.ShapeDtypeStruct((b, g_pad, hop_pad), jnp.float32),
        interpret=interpret,
    )(ph, tab0, tab1, gg)
    dtab_t = pl.pallas_call(
        functools.partial(_bwd_dtab_kernel, s=s, hop=hop, r=r),
        grid=grid,
        in_specs=[spec_r, spec_r],
        out_specs=pl.BlockSpec((1, 1, _GROUP, 2 * s),
                               lambda bi, gi, sub: (bi, sub, gi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_sub, g_pad, 2 * s),
                                       jnp.float32),
        interpret=interpret,
    )(ph, gg)
    dtab = dtab_t.sum(axis=1)                       # (b, g_pad, 2S)
    dt0, dt1 = dtab[..., :s], dtab[..., s:]
    d_ph = dph[:, :blocks, :hop]
    d_tables = jnp.zeros((b, tables.shape[1], s), jnp.float32)
    d_tables = d_tables.at[:, :blocks].add(dt0[:, :blocks])
    d_tables = d_tables.at[:, 1:blocks + 1].add(dt1[:, :blocks])
    return d_ph, d_tables.astype(tables.dtype)
