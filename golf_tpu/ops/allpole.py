"""Time-varying all-pole (LPC synthesis) filters — the hot kernel.

Reference semantics (torchlpc ``sample_wise_lpc``, used at
``models/filters.py:112``):

    y[n] = x[n] - sum_{i=1..p} a_i[n] * y[n-i]

with zero initial state. The reference implements this with Numba CPU/CUDA
loops and a hand-written O(T) adjoint. Here it is built TPU-first:

* ``allpole_scan``: plain ``lax.scan`` reference (correctness baseline).
* ``allpole``: **blocked two-pass parallel scan**. Time is split into K
  blocks of length L. Pass A runs all blocks in parallel, tracking the
  affine map from the block's incoming boundary state s_in (the last p
  outputs of the previous block) to every output sample: carry is the
  (p x (p+1)) matrix W_t with s_t = W_t @ [s_in; 1]. Pass B composes the
  per-block affine maps with an associative scan (depth log K) to recover
  every block's true incoming state, and a final batched matmul (MXU) adds
  the boundary-state correction: y = y0 + H @ s_in. Sequential depth drops
  from T to L + log K at ~(p+2)x the FLOPs — the right trade on TPU where
  the VPU/MXU eat wide parallel work.
* custom VJP implementing the time-reversed adjoint recurrence
  (same O(T) trick as torchlpc): dx solves the transposed system
  dx[n] = g[n] - sum_i a_i[n+i] dx[n+i], run as a flipped forward filter
  with column-shifted coefficients; da_i[n] = -dx[n] * y[n-i].

Constant-coefficient variants (per-frame LPC synthesis, LTI allpass) reuse
the same machinery.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _choose_block(t: int) -> int:
    """Pick a block length ~sqrt(T) rounded to a multiple of 8."""
    l = int(math.sqrt(t))
    l = max(8, (l + 7) // 8 * 8)
    return min(l, t)


# ---------------------------------------------------------------------------
# Plain scan reference
# ---------------------------------------------------------------------------

def allpole_scan(x: jax.Array, a: jax.Array,
                 zi: Optional[jax.Array] = None) -> jax.Array:
    """Sequential reference. x: (B, T), a: (B, T, p) -> (B, T)."""
    b, t = x.shape
    p = a.shape[-1]
    state0 = jnp.zeros((b, p), x.dtype) if zi is None else zi
    # tie the carry's device-varying type to the input's (no-op outside
    # shard_map; required for vma type-checking when called in-shard)
    state0 = state0 + 0 * x[:, :1]

    def step(s, inp):
        x_t, a_t = inp
        y_t = x_t - jnp.sum(a_t * s, axis=-1)
        s = jnp.concatenate([y_t[:, None], s[:, :-1]], axis=1)
        return s, y_t

    _, y = lax.scan(step, state0,
                    (jnp.moveaxis(x, 1, 0), jnp.moveaxis(a, 1, 0)))
    return jnp.moveaxis(y, 0, 1)


# ---------------------------------------------------------------------------
# Blocked two-pass implementation
# ---------------------------------------------------------------------------

def _allpole_blocked(x: jax.Array, a: jax.Array, zi: jax.Array,
                     block_size: int) -> jax.Array:
    bsz, t = x.shape
    p = a.shape[-1]
    l = min(block_size, t)
    k = (t + l - 1) // l
    pad = k * l - t
    xp = jnp.pad(x, ((0, 0), (0, pad))).reshape(bsz, k, l)
    ap = jnp.pad(a, ((0, 0), (0, pad), (0, 0))).reshape(bsz, k, l, p)

    # Pass A: per-block affine tracking. W: (B, K, p, p+1);
    # rows are [y[t-1], ..., y[t-p]] as affine functions of [s_in; 1].
    # (+ 0*xp: carry vma typing, see allpole_scan)
    eye = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(p, dtype=x.dtype),
                         jnp.zeros((p, 1), x.dtype)], axis=1),
        (bsz, k, p, p + 1)) + 0 * xp[:, :, :1, None]

    def step_a(w, inp):
        x_t, a_t = inp  # (B,K), (B,K,p)
        r = -jnp.einsum("bkp,bkpq->bkq", a_t, w)
        r = r.at[..., p].add(x_t)
        w = jnp.concatenate([r[:, :, None, :], w[:, :, :-1, :]], axis=2)
        return w, r

    w_end, rs = lax.scan(
        step_a, eye,
        (jnp.moveaxis(xp, 2, 0), jnp.moveaxis(ap, 2, 0)))
    # rs: (L, B, K, p+1): sensitivity rows per output sample.
    h = jnp.moveaxis(rs[..., :p], 0, 2)       # (B, K, L, p)
    y0 = jnp.moveaxis(rs[..., p], 0, 2)        # (B, K, L)

    # Pass B: compose per-block maps s_out = M s_in + v (log-depth).
    m_blk = w_end[..., :p]                     # (B, K, p, p)
    v_blk = w_end[..., p]                      # (B, K, p)

    def combine(e1, e2):
        m1, v1 = e1
        m2, v2 = e2
        return (jnp.einsum("bkij,bkjl->bkil", m2, m1),
                jnp.einsum("bkij,bkj->bki", m2, v1) + v2)

    m_cum, v_cum = lax.associative_scan(combine, (m_blk, v_blk), axis=1)
    # incoming state of block k: cum map of blocks [0..k-1] applied to zi
    s_in = jnp.concatenate([
        zi[:, None, :],
        jnp.einsum("bkij,bj->bki", m_cum[:, :-1], zi) + v_cum[:, :-1],
    ], axis=1)                                  # (B, K, p)

    # Final correction on the MXU: y = y0 + H @ s_in
    y = y0 + jnp.einsum("bklp,bkp->bkl", h, s_in)
    return y.reshape(bsz, k * l)[:, :t]


def _dispatch_table():
    """Measured pallas-vs-blocked dispatch table (written by
    ``tools/allpole_sweep.py`` on the target chip). Each entry:
    {"kernel": "tv"|"const", "b": B, "t": T, "p": p,
     "winner": "pallas"|"blocked"}. ``None`` when no sweep recorded."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "allpole_dispatch.json")
    try:
        with open(path) as f:
            return json.load(f)["entries"]
    except Exception:
        return None


from functools import lru_cache as _lru_cache  # noqa: E402

_dispatch_table = _lru_cache(maxsize=None)(_dispatch_table)


@_lru_cache(maxsize=None)
def _table_winner(kernel: str, b: int, t: int, p: int) -> Optional[str]:
    """Nearest measured grid point in log-shape space."""
    import math
    tab = _dispatch_table()
    if not tab:
        return None
    best, best_d = None, None
    for e in tab:
        if e["kernel"] != kernel:
            continue
        d = (abs(math.log(max(b, 1)) - math.log(max(e["b"], 1))) +
             abs(math.log(max(t, 1)) - math.log(max(e["t"], 1))) +
             abs(math.log(max(p, 1)) - math.log(max(e["p"], 1))))
        if best_d is None or d < best_d:
            best, best_d = e["winner"], d
    return best


def _use_pallas(x: jax.Array, p: int = 22, kernel: str = "tv") -> bool:
    """Backend dispatch: measured table when a sweep has been recorded on
    this image (``tools/allpole_sweep.py`` -> ``allpole_dispatch.json``),
    else the heuristic — the Pallas kernel keeps batch on the 128-wide
    lane axis, so it wins once the batch fills lanes (training shapes);
    the blocked formulation wins at small batch (inference) where its
    block-parallelism is the only parallel axis. Measured on v5e at
    B=64/T=48k/p=22: pallas 28.5 ms vs blocked 46.4 ms; at B=1 blocked
    is ~0.05 ms vs a lane-starved sequential kernel."""
    import os
    if os.environ.get("GOLF_TPU_NO_PALLAS"):
        return False
    try:
        import jax as _jax
        on_tpu = _jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if not on_tpu:
        return False
    w = _table_winner(kernel, int(x.shape[0]), int(x.shape[1]), int(p))
    if w is not None:
        return w == "pallas"
    return x.shape[0] >= (256 if kernel == "const" else 32)


def _allpole_impl(x: jax.Array, a: jax.Array, zi: jax.Array,
                  block_size: Optional[int],
                  allow_pallas: bool = False) -> jax.Array:
    t = x.shape[1]
    if allow_pallas and _use_pallas(x, a.shape[-1], "tv"):
        from .allpole_pallas import allpole_pallas
        return allpole_pallas(x, a)
    if block_size is None:
        block_size = _choose_block(t)
    if t <= 64 or block_size >= t:
        return allpole_scan(x, a, zi)
    return _allpole_blocked(x, a, zi, block_size)


# ---------------------------------------------------------------------------
# custom VJP: time-reversed adjoint (torchlpc backward semantics)
# ---------------------------------------------------------------------------

def _shift_columns(a: jax.Array) -> jax.Array:
    """c[:, n, j] = a[:, n + j + 1, j], zero past the end.

    These are the coefficients of the transposed system evaluated at the
    times they multiply dx: coefficient i of the adjoint recurrence at time
    n is a_i[n + i].
    """
    p = a.shape[-1]
    cols = [jnp.pad(a[:, j + 1:, j], ((0, 0), (0, j + 1)))
            for j in range(p)]
    return jnp.stack(cols, axis=-1)


def _delayed_stack(y: jax.Array, p: int) -> jax.Array:
    """d[:, n, j] = y[:, n - j - 1], zero before start. (B,T) -> (B,T,p)."""
    cols = [jnp.pad(y[:, : y.shape[1] - j - 1], ((0, 0), (j + 1, 0)))
            for j in range(p)]
    return jnp.stack(cols, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _allpole_vjp(x: jax.Array, a: jax.Array,
                 block_size: Optional[int]) -> jax.Array:
    p = a.shape[-1]
    zi = jnp.zeros((x.shape[0], p), x.dtype)
    return _allpole_impl(x, a, zi, block_size, allow_pallas=True)


def _allpole_fwd(x, a, block_size):
    y = _allpole_vjp(x, a, block_size)
    return y, (y, a)


def _allpole_bwd(block_size, res, g):
    y, a = res
    p = a.shape[-1]
    c = _shift_columns(a)
    zi = jnp.zeros((g.shape[0], p), g.dtype)
    dx = jnp.flip(
        _allpole_impl(jnp.flip(g, 1), jnp.flip(c, 1), zi, block_size,
                      allow_pallas=True), 1)
    da = -dx[..., None] * _delayed_stack(y, p)
    return dx, da


_allpole_vjp.defvjp(_allpole_fwd, _allpole_bwd)


def allpole_stream(x: jax.Array, a: jax.Array,
                   zi: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array]:
    """Stateful time-varying all-pole for chunked/streaming serving.

    x: (B, T_chunk), a: (B, T_chunk, p), zi: (B, p) — the filter state,
    i.e. the last p OUTPUTS of the previous chunk, most recent first
    (zeros at stream start). Returns (y, zi_next) so that feeding
    consecutive chunks reproduces the one-shot ``allpole`` on the
    concatenated signal exactly. Inference-path op (no custom VJP);
    fp32 state like ``allpole``.
    """
    p = a.shape[-1]
    assert x.shape[1] >= p, (x.shape, p)
    if zi is None:
        zi = jnp.zeros((x.shape[0], p), jnp.float32)
    dt = x.dtype
    y = _allpole_impl(x.astype(jnp.float32), a.astype(jnp.float32),
                      zi.astype(jnp.float32), None)
    zi_next = y[:, -1:-p - 1:-1]
    return y.astype(dt), zi_next


def allpole(x: jax.Array, a: jax.Array,
            block_size: Optional[int] = None) -> jax.Array:
    """Differentiable time-varying all-pole filter.

    x: (B, T) excitation; a: (B, T, p) coefficients (a1..ap per sample).
    Returns y: (B, T). fp32 state regardless of input dtype (the recurrence
    is numerically delicate at order 22 — reference keeps fp32 too).
    """
    dt = x.dtype
    y = _allpole_vjp(x.astype(jnp.float32), a.astype(jnp.float32), block_size)
    return y.astype(dt)


# ---------------------------------------------------------------------------
# Constant-coefficient (per-sequence) variant — frame-wise LPC synthesis
# ---------------------------------------------------------------------------

def _allpole_const_blocked(x: jax.Array, a: jax.Array,
                           block_size: int) -> jax.Array:
    """Blocked two-pass all-pole with CONSTANT per-sequence coefficients.

    Same affine-boundary-state algorithm as ``_allpole_blocked`` but the
    coefficients don't vary in time, so (1) the state-sensitivity block H
    and the per-block transition M are identical for every block of a
    sequence — pass A tracks them once per sequence, K-free — and (2) only
    the zero-state response runs over (N, K). Sequential depth T -> L +
    log K; this is what lifts frame-wise GOLF-ff serving off the plain
    960-step scan (round-4 VERDICT #5: 54 ms at B=1).
    """
    n, t = x.shape
    p = a.shape[-1]
    l = min(max(block_size, p), t)   # v_blk slices the last p outputs
    k = (t + l - 1) // l
    pad = k * l - t
    xp = jnp.pad(x, ((0, 0), (0, pad))).reshape(n, k, l)

    # Pass A-y0: zero-state response of each block (N, K) in parallel.
    def step_y(s, x_t):                       # s: (N, K, p)
        y_t = x_t - jnp.einsum("np,nkp->nk", a, s)
        s = jnp.concatenate([y_t[..., None], s[..., :-1]], axis=-1)
        return s, y_t

    _, y0 = lax.scan(step_y, jnp.zeros((n, k, p), x.dtype),
                     jnp.moveaxis(xp, 2, 0))
    y0 = jnp.moveaxis(y0, 0, 2)               # (N, K, L)

    # Pass A-H: state sensitivity, once per sequence (K-free): rows of
    # w are [y[t-1..t-p]] as linear functions of s_in.
    eye = jnp.broadcast_to(jnp.eye(p, dtype=x.dtype), (n, p, p))

    def step_h(w, _):
        r = -jnp.einsum("np,npq->nq", a, w)   # (N, p)
        w = jnp.concatenate([r[:, None, :], w[:, :-1, :]], axis=1)
        return w, r

    w_end, hs = lax.scan(step_h, eye, None, length=l)
    h = jnp.moveaxis(hs, 0, 1)                # (N, L, p)
    m_blk = w_end                             # (N, p, p): s_out = M s_in + v

    # Pass B: incoming state of block k. M is constant per sequence, the
    # offset v differs per block (it is the last p outputs of the block's
    # zero-state response): v[k][i] = y0[k, L-1-i] + (H s_in correction is
    # folded by the associative scan over (M, v)).
    idx_last = jnp.arange(p)
    v_blk = y0[:, :, l - 1 - idx_last]        # (N, K, p) via static slice
    m_b = jnp.broadcast_to(m_blk[:, None], (n, k, p, p))

    def combine(e1, e2):
        m1, v1 = e1
        m2, v2 = e2
        return (jnp.einsum("nkij,nkjl->nkil", m2, m1),
                jnp.einsum("nkij,nkj->nki", m2, v1) + v2)

    m_cum, v_cum = lax.associative_scan(combine, (m_b, v_blk), axis=1)
    s_in = jnp.concatenate([
        jnp.zeros((n, 1, p), x.dtype), v_cum[:, :-1]], axis=1)  # zi = 0

    y = y0 + jnp.einsum("nlp,nkp->nkl", h, s_in)
    return y.reshape(n, k * l)[:, :t]


def _allpole_const_impl(x: jax.Array, a: jax.Array) -> jax.Array:
    """x: (N, T), a: (N, p) constant per sequence."""
    n, t = x.shape
    p = a.shape[-1]
    if _use_pallas(x, p, "const"):
        from .allpole_pallas import allpole_const_pallas
        return allpole_const_pallas(x, a)
    if t > max(64, p):
        return _allpole_const_blocked(x, a, _choose_block(t))

    def step(s, x_t):
        y_t = x_t - jnp.sum(a * s, axis=-1)
        s = jnp.concatenate([y_t[:, None], s[:, :-1]], axis=1)
        return s, y_t

    _, y = lax.scan(step, jnp.zeros((n, p), x.dtype), jnp.moveaxis(x, 1, 0))
    return jnp.moveaxis(y, 0, 1)


@jax.custom_vjp
def _allpole_const_vjp(x: jax.Array, a: jax.Array) -> jax.Array:
    return _allpole_const_impl(x, a)


def _allpole_const_fwd(x, a):
    y = _allpole_const_vjp(x, a)
    return y, (y, a)


def _allpole_const_bwd(res, g):
    y, a = res
    p = a.shape[-1]
    t = y.shape[1]
    # constant coefficients: transposed system == same coeffs, reversed time
    dx = jnp.flip(_allpole_const_impl(jnp.flip(g, 1), a), 1)
    # da[:, j] = -sum_t dx[:, t] * y[:, t-j-1]: p shifted dots, avoiding
    # the (N, T, p) delayed-stack intermediate (0.5 GB at training shape)
    da = -jnp.stack([jnp.sum(dx[:, j + 1:] * y[:, :t - j - 1], axis=1)
                     for j in range(p)], axis=-1)
    return dx, da


_allpole_const_vjp.defvjp(_allpole_const_fwd, _allpole_const_bwd)


def allpole_const(x: jax.Array, a: jax.Array) -> jax.Array:
    """Constant-coefficient all-pole. x: (N, T), a: (N, p) -> (N, T)."""
    dt = x.dtype
    y = _allpole_const_vjp(x.astype(jnp.float32), a.astype(jnp.float32))
    return y.astype(dt)


def lpc_synthesis(source: jax.Array, gains: jax.Array,
                  a: jax.Array) -> jax.Array:
    """Frame-wise LPC synthesis: y = lfilter(x, [1, a...], [gain, 0...]).

    Reference ``models/lpc.py:11-16``. source: (N, T), gains: (N,),
    a: (N, p).
    """
    return allpole_const(source * gains[:, None], a)


def lfilter(x: jax.Array, a_coeffs: jax.Array,
            b_coeffs: jax.Array) -> jax.Array:
    """Full constant IIR like torchaudio.functional.lfilter (unbatched
    coefficients, no clamp). x: (B, T); a_coeffs, b_coeffs: (K,)."""
    a0 = a_coeffs[0]
    b = b_coeffs / a0
    a = a_coeffs[1:] / a0
    k = b.shape[0]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0)))[:, None, :]
    # constant FIR as a conv (no (T, K) gather / scatter-add backward)
    fir_out = jax.lax.conv_general_dilated(
        xp, jnp.flip(b)[None, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]
    a_b = jnp.broadcast_to(a, (x.shape[0], a.shape[0]))
    return allpole_const(fir_out, a_b)
