"""Pallas TPU kernels for the blocked bilinear wavetable lookup.

The serving chain's hot spot is the grid_sample-equivalent lookup in
``models/synth.py::_bilinear_table_lookup`` (reference
``models/synth.py:124-177``): four ``take_along_axis`` gathers over the
2048-wide table axis, which XLA lowers to the slow serial gather path
(~10 ns/element on v5e).

TPU has no vector gather; the fast formulation is a ONE-HOT MATMUL kept
entirely in VMEM. The round-4 kernel built a full (S, r) one-hot and hit
two walls at S=2048: the iota-compare one-hot build is S*r VPU ops, and
the dot ``(4, S) @ (S, r)`` occupies 4 of 128 MXU sublanes. Both scale
with S for work that is logically a 4-element gather.

This version decomposes the table index TWO-LEVEL: ``c = hi*128 + lo``
with ``H = S // 128``. Per hop-block every sample interpolates between
the same two table rows, so each (batch, 8-block group, lane tile r):

  - build lane one-hots ``L[l, i] = (lo_i == l)`` — (128, r) compares,
    S/128 times fewer VPU ops than the flat one-hot;
  - reshape the block's two table rows to ``M2 = (2H, 128)`` (done in
    XLA, free) and take ``Q = M2 @ L`` on the MXU — every sample's
    candidate value at its ``lo`` column for ALL 2H (table, hi) chunks:
    a (2H, 128) x (128, r) dot, 8x the sublane occupancy of the flat
    form at S=2048 for identical FLOPs;
  - pick the 2 live rows per sample with an H-step masked accumulate
    over ``hi`` (VPU, H*r ops);
  - combine with the in-block column/row weights (cw, rw) on the VPU.

The wraparound column c0+1 == S maps to (hi=0, lo=0) = table[..., 0],
matching the jnp path's wrap-padded gather; it gets its own one-hot L1,
so the flat kernel's lane-rolled table copies are gone.

Exactness: one-hot columns select single elements, so the fp32
HIGHEST-precision matmul reproduces the gathered values bit-exactly;
the weight combine uses the same expressions as the jnp path.

Backward: the forward (res variant) additionally emits the corner
differences ``d_top = v01 - v00`` and ``d_bot = v11 - v10``, which make
the phase cotangent PURELY ELEMENTWISE (``dph = g*S*((1-rw)*d_top +
rw*d_bot)``, fused by XLA into neighbouring ops — no kernel, no
recomputed dot). The table cotangent is a per-block histogram
``dtab = W @ L^T`` with the same two-level trick: W rows are
(corner, hi) masked weights, giving a well-shaped (2H, r) x (r, 128)
dot — again identical FLOPs to the flat form at 8x the occupancy.
The round-4 flat adjoint measured 219 ms of the B=32 training step's
backward (docs/results_r5/bwd_stage.json); this form replaces its
(S, r) one-hot + (S, 4)-shaped dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_GROUP = 8           # blocks per tile (sublane-divisibility requirement)
_MAX_R = 2048        # lane-tile cap
_VMEM_BUDGET = 2 ** 22   # live-set cap for tile picking (fwd and bwd)
_MAX_H = 64          # unrolled hi-select loop bound (S <= 8192)


def _decompose(ph, s):
    """col/c0/cw + two-level (hi, lo) for c0 and the wrapped c0+1."""
    col = ph * s
    c0f = jnp.clip(jnp.floor(col), 0, s - 1)
    c0 = c0f.astype(jnp.int32)
    cw = col - c0f
    c1 = c0 + 1
    c1 = jnp.where(c1 == s, 0, c1)          # wraparound column
    hi0 = c0 // 128
    lo0 = c0 - hi0 * 128
    hi1 = c1 // 128
    lo1 = c1 - hi1 * 128
    return cw, hi0, lo0, hi1, lo1


def _hi_masks(hi0, hi1, h, r):
    """(H, r) one-hot masks over the hi chunk index."""
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, r), 0)
    m0 = (iota_h == hi0[None, :]).astype(jnp.float32)
    m1 = (iota_h == hi1[None, :]).astype(jnp.float32)
    return m0, m1


def _corners(m2, lo0, lo1, hi0, hi1, h, r):
    """Two dots + hi-select -> the four bilinear corner values."""
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, r), 0)
    l0 = (iota_l == lo0[None, :]).astype(jnp.float32)        # (128, r)
    l1 = (iota_l == lo1[None, :]).astype(jnp.float32)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    q0 = dot(m2, l0)                                         # (2H, r)
    q1 = dot(m2, l1)
    m0, m1 = _hi_masks(hi0, hi1, h, r)
    v00 = jnp.sum(m0 * q0[:h], axis=0)
    v10 = jnp.sum(m0 * q0[h:], axis=0)
    v01 = jnp.sum(m1 * q1[:h], axis=0)
    v11 = jnp.sum(m1 * q1[h:], axis=0)
    return v00, v01, v10, v11


def _fwd_kernel(ph_ref, tab0_ref, tab1_ref, o_ref, *, s: int, hop: int,
                r: int, residuals: bool, dtop_ref=None, dbot_ref=None):
    h = s // 128
    sub = pl.program_id(2)
    lane0 = (sub * r).astype(jnp.float32)
    for j in range(_GROUP):
        ph = ph_ref[0, j, :]                                 # (r,)
        cw, hi0, lo0, hi1, lo1 = _decompose(ph, s)
        m2 = jnp.concatenate([tab0_ref[0, j], tab1_ref[0, j]],
                             axis=0)                         # (2H, 128)
        v00, v01, v10, v11 = _corners(m2, lo0, lo1, hi0, hi1, h, r)
        top = v00 * (1 - cw) + v01 * cw
        bot = v10 * (1 - cw) + v11 * cw
        rw = (lane0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, r), 1)[0].astype(jnp.float32)) * (1.0 / hop)
        o_ref[0, j, :] = top * (1 - rw) + bot * rw
        if residuals:
            dtop_ref[0, j, :] = v01 - v00
            dbot_ref[0, j, :] = v11 - v10


def _dtab_kernel(ph_ref, g_ref, dtab_ref, *, s: int, hop: int, r: int):
    """Table half of the adjoint: per block, scatter the four corner
    weights into (2, S) via two well-shaped dots
    ``(2H, r) @ (r, 128) -> (2H, 128)``:
      W0 rows (hi, table) hold ``w * (hi0 == hi)`` for the c0 column,
      W1 likewise for the wrapped c0+1 column; right operands are the
      TRANSPOSED lane one-hots. Each lane tile writes its own output
      slice, summed over tiles outside the kernel (revisited accumulator
      outputs made XLA pin whole d_tab arrays in scoped vmem)."""
    h = s // 128
    sub = pl.program_id(2)
    lane0 = (sub * r).astype(jnp.float32)
    for j in range(_GROUP):
        ph = ph_ref[0, j, :]
        cw, hi0, lo0, hi1, lo1 = _decompose(ph, s)
        g = g_ref[0, j, :]
        rw = (lane0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, r), 1)[0].astype(jnp.float32)) * (1.0 / hop)
        wa = g * (1 - rw) * (1 - cw)         # -> tab0[c0]
        wb = g * (1 - rw) * cw               # -> tab0[c1]
        wc = g * rw * (1 - cw)               # -> tab1[c0]
        wd = g * rw * cw                     # -> tab1[c1]

        iota_r = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
        l0t = (iota_r == lo0[:, None]).astype(jnp.float32)   # (r, 128)
        l1t = (iota_r == lo1[:, None]).astype(jnp.float32)

        m0, m1 = _hi_masks(hi0, hi1, h, r)                   # (H, r)
        w0 = jnp.concatenate([m0 * wa[None], m0 * wc[None]], axis=0)
        w1 = jnp.concatenate([m1 * wb[None], m1 * wd[None]], axis=0)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d = dot(w0, l0t) + dot(w1, l1t)                      # (2H, 128)
        dtab_ref[0, 0, j, :s] = d[:h].reshape(s)
        dtab_ref[0, 0, j, s:] = d[h:].reshape(s)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _live_bytes(r: int, s: int) -> int:
    """Upper bound on a tile's large VMEM residents (fwd or bwd):
    two (128, r) one-hots + two (2H, r) stacks + a few (GROUP, r)
    blocks + the (GROUP, 2S) dtab slice."""
    h = s // 128
    return 4 * (2 * 128 * r + 2 * 2 * h * r + 6 * _GROUP * r
                + 2 * _GROUP * s)


def _pick_tile(hop_pad: int, s: int, budget: int = _VMEM_BUDGET) -> int:
    """Largest 128-multiple divisor of hop_pad within the VMEM budget
    and _MAX_R."""
    best = 0
    for r in range(128, min(_MAX_R, hop_pad) + 1, 128):
        if hop_pad % r == 0 and _live_bytes(r, s) <= budget:
            best = r
    return best


def lookup_supported(hop: int, s: int) -> bool:
    # s must divide into 128-lane tiles, the unrolled hi-select must
    # stay reasonable, and the minimal r=128 tile must fit VMEM.
    return (s % 128 == 0 and hop >= 8 and s // 128 <= _MAX_H
            and _live_bytes(128, s) <= _VMEM_BUDGET)


def bwd_supported(hop: int, s: int) -> bool:
    """The two-level adjoint has the same footprint as the forward."""
    return lookup_supported(hop, s)


def _pad_operands(ph_blocks, tables, hop):
    b, blocks, _ = ph_blocks.shape
    s = tables.shape[-1]
    hop_pad = _round_up(hop, 128)
    g_pad = _round_up(blocks, _GROUP)
    r = _pick_tile(hop_pad, s)
    assert r > 0, (hop, s, "use lookup_supported() before calling")
    ph = jnp.pad(ph_blocks.astype(jnp.float32),
                 ((0, 0), (0, g_pad - blocks), (0, hop_pad - hop)))
    h = s // 128
    tabs = tables.astype(jnp.float32)
    tab0 = jnp.pad(tabs[:, :blocks], ((0, 0), (0, g_pad - blocks), (0, 0)))
    tab1 = jnp.pad(tabs[:, 1:blocks + 1],
                   ((0, 0), (0, g_pad - blocks), (0, 0)))
    tab0 = tab0.reshape(b, g_pad, h, 128)
    tab1 = tab1.reshape(b, g_pad, h, 128)
    return ph, tab0, tab1, hop_pad, g_pad, r


def _fwd_res_kernel(ph_ref, tab0_ref, tab1_ref, o_ref, dtop_ref,
                    dbot_ref, *, s, hop, r):
    _fwd_kernel(ph_ref, tab0_ref, tab1_ref, o_ref, s=s, hop=hop, r=r,
                residuals=True, dtop_ref=dtop_ref, dbot_ref=dbot_ref)


@functools.partial(jax.jit, static_argnums=(2, 3))
def bilinear_lookup_pallas(ph_blocks: jax.Array, tables: jax.Array,
                           hop: int, interpret: bool = False) -> jax.Array:
    """ph_blocks: (B, blocks, hop) wrapped phase in [0,1);
    tables: (B, >=blocks+1, S) edge-padded table rows (rows f and f+1
    bound block f). Returns (B, blocks, hop)."""
    b, blocks, hop_ = ph_blocks.shape
    assert hop_ == hop
    s = tables.shape[-1]
    assert tables.shape[1] >= blocks + 1, (tables.shape, blocks)
    h = s // 128
    interpret = interpret or jax.default_backend() == "cpu"
    ph, tab0, tab1, hop_pad, g_pad, r = _pad_operands(
        ph_blocks, tables, hop)
    grid = (b, g_pad // _GROUP, hop_pad // r)
    spec_r = pl.BlockSpec((1, _GROUP, r), lambda bi, g, sub: (bi, g, sub))
    spec_t = pl.BlockSpec((1, _GROUP, h, 128),
                          lambda bi, g, sub: (bi, g, 0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, hop=hop, r=r, residuals=False),
        grid=grid,
        in_specs=[spec_r, spec_t, spec_t],
        out_specs=spec_r,
        out_shape=jax.ShapeDtypeStruct((b, g_pad, hop_pad), jnp.float32),
        interpret=interpret,
    )(ph, tab0, tab1)
    return out[:, :blocks, :hop]


@functools.partial(jax.jit, static_argnums=(2, 3))
def bilinear_lookup_pallas_res(ph_blocks: jax.Array, tables: jax.Array,
                               hop: int, interpret: bool = False):
    """Forward + backward residuals: returns (out, d_top, d_bot) with
    d_top = v01 - v00 and d_bot = v11 - v10 per sample, from which the
    phase cotangent is elementwise (see dph_from_res)."""
    b, blocks, hop_ = ph_blocks.shape
    assert hop_ == hop
    s = tables.shape[-1]
    assert tables.shape[1] >= blocks + 1, (tables.shape, blocks)
    h = s // 128
    interpret = interpret or jax.default_backend() == "cpu"
    ph, tab0, tab1, hop_pad, g_pad, r = _pad_operands(
        ph_blocks, tables, hop)
    grid = (b, g_pad // _GROUP, hop_pad // r)
    spec_r = pl.BlockSpec((1, _GROUP, r), lambda bi, g, sub: (bi, g, sub))
    spec_t = pl.BlockSpec((1, _GROUP, h, 128),
                          lambda bi, g, sub: (bi, g, 0, 0))
    shape_r = jax.ShapeDtypeStruct((b, g_pad, hop_pad), jnp.float32)
    out, dtop, dbot = pl.pallas_call(
        functools.partial(_fwd_res_kernel, s=s, hop=hop, r=r),
        grid=grid,
        in_specs=[spec_r, spec_t, spec_t],
        out_specs=[spec_r, spec_r, spec_r],
        out_shape=[shape_r, shape_r, shape_r],
        interpret=interpret,
    )(ph, tab0, tab1)
    sl = (slice(None), slice(0, blocks), slice(0, hop))
    return out[sl], dtop[sl], dbot[sl]


def dph_from_res(g: jax.Array, d_top: jax.Array, d_bot: jax.Array,
                 s: int, hop: int) -> jax.Array:
    """Elementwise phase cotangent from the saved corner differences."""
    rw = (jnp.arange(hop, dtype=jnp.float32) / hop)[None, None, :]
    return g * s * ((1 - rw) * d_top + rw * d_bot)


@functools.partial(jax.jit, static_argnums=(2, 4))
def bilinear_lookup_pallas_dtab(ph_blocks: jax.Array, g: jax.Array,
                                hop: int, tables_like: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """Table cotangent: (B, blocks, hop) phase + cotangent ->
    (B, frames, S) gradient (frames/S taken from ``tables_like``)."""
    b, blocks, hop_ = ph_blocks.shape
    assert hop_ == hop
    s = tables_like.shape[-1]
    h = s // 128
    interpret = interpret or jax.default_backend() == "cpu"
    hop_pad = _round_up(hop, 128)
    g_pad = _round_up(blocks, _GROUP)
    r = _pick_tile(hop_pad, s)
    assert r > 0, (hop, s, "use bwd_supported() before calling")
    pad3 = ((0, 0), (0, g_pad - blocks), (0, hop_pad - hop))
    ph = jnp.pad(ph_blocks.astype(jnp.float32), pad3)
    gg = jnp.pad(g.astype(jnp.float32), pad3)  # zero-padded cotangent
    n_sub = hop_pad // r
    grid = (b, g_pad // _GROUP, n_sub)
    spec_r = pl.BlockSpec((1, _GROUP, r), lambda bi, gi, sub: (bi, gi, sub))
    dtab_t = pl.pallas_call(
        functools.partial(_dtab_kernel, s=s, hop=hop, r=r),
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
    d_tables = jnp.zeros((b, tables_like.shape[1], s), jnp.float32)
    d_tables = d_tables.at[:, :blocks].add(dt0[:, :blocks])
    d_tables = d_tables.at[:, 1:blocks + 1].add(dt1[:, :blocks])
    return d_tables.astype(tables_like.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4))
def bilinear_lookup_pallas_bwd(ph_blocks: jax.Array, tables: jax.Array,
                               g: jax.Array, hop: int,
                               interpret: bool = False):
    """Full adjoint of :func:`bilinear_lookup_pallas` without saved
    residuals (recomputes the corner differences): cotangent ``g`` of
    the (B, blocks, hop) output -> (d_ph_blocks, d_tables). The
    training VJP (models/synth.py) instead saves residuals from the
    forward and skips the recompute."""
    s = tables.shape[-1]
    _, dtop, dbot = bilinear_lookup_pallas_res(
        ph_blocks, tables, hop, interpret)
    d_ph = dph_from_res(g, dtop, dbot, s, hop)
    d_tables = bilinear_lookup_pallas_dtab(ph_blocks, g, hop, tables,
                                           interpret)
    return d_ph, d_tables
