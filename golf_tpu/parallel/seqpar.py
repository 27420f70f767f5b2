"""Sequence (time-axis) parallelism for the full synthesis chain.

Round-1 shipped time-sharding as an isolated all-pole op; this module makes
it an end-to-end capability (SURVEY.md §2.5 north-star): the complete
GOLF synthesis chain — phase integration, wavetable lookup, oversampled
decimation, zero-phase FIR noise shaping, the sample-wise time-varying
all-pole filter, the LTI room filter, and the MSS loss — runs inside ONE
``shard_map`` over a (data × time) mesh with every sample-rate tensor
sharded along time.

Design (TPU-first, not a translation — the reference has no sequence
parallelism at all):

* **Frame-rate tensors stay replicated, sample-rate tensors shard.** The
  neural encoder works at frame rate (hop≥240): its inputs/outputs are
  ~240x smaller than the waveform, so each time-shard computes the full
  frame-rate control tensors redundantly (one tiled all_gather of the
  input waveform) and the expensive sample-rate DSP — where the memory
  and FLOPs live — is sharded. ``localize()`` converts a replicated
  frame-rate ``Sig`` into this shard's sample-rate window, fusing the
  hop-algebra linear upsample with the window slice.
* **Boundary exchange per op class**:
  - IIR (all-pole): each shard summarizes its chunk as an affine map
    ``s_out = M s_in + v`` (p x (p+1) floats); one tiny ``all_gather``
    + local prefix composition recovers every shard's true incoming
    state — O(p^2) communication regardless of T.
  - FIR / framed ops (noise filter, decimation, STFT losses): halo
    exchange (overlap-save) via ``ppermute`` of the kernel-support
    samples.
  - Phase integration: local ``cumsum`` + all_gather of per-shard sums
    (exclusive prefix offset).
* **Exact parity**: with the same params and rng keys, the sharded
  training step computes bit-comparable loss and gradients to the
  single-device step (tests/test_seqpar.py) — RNG draws are made over
  global shapes and window-sliced so shard boundaries do not change the
  noise.

The env is trace-time state: modules consult ``seqpar.current()`` and
take their sharded branch when active (static Python branching — each
mesh layout is its own jit trace, XLA-friendly).
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.sig import Sig, linear_upsample

_ACTIVE: list = []


@dataclasses.dataclass
class SeqParEnv:
    """Static trace-time context for one sharded step."""

    time_axis: str
    n_time: int
    t_global: int          # global sample-rate length
    b_global: int          # global batch
    data_axis: Optional[str] = None
    n_data: int = 1
    # Longest prefix of the output that is exactly the unsharded result
    # (coefficient upsampling runs out of frames near the global end and
    # the sharded chain edge-holds instead of truncating; the loss is
    # restricted to this region). Updated during the decoder trace.
    valid_len: Optional[int] = None

    @property
    def t_local(self) -> int:
        return self.t_global // self.n_time

    def shrink_valid(self, n: int):
        self.valid_len = n if self.valid_len is None else min(
            self.valid_len, n)


def current() -> Optional[SeqParEnv]:
    return _ACTIVE[-1] if _ACTIVE else None


@contextmanager
def activate(env: SeqParEnv):
    _ACTIVE.append(env)
    try:
        yield env
    finally:
        _ACTIVE.pop()


# ---------------------------------------------------------------------------
# collective helpers (call inside the shard_map body)
# ---------------------------------------------------------------------------

def tidx(env: SeqParEnv):
    return lax.axis_index(env.time_axis)


def halo_left(x: jax.Array, n: int, env: SeqParEnv) -> jax.Array:
    """Last ``n`` time samples of the LEFT neighbor (zeros on shard 0).
    Time axis is dim 1."""
    if n == 0:
        return x[:, :0]
    src = x[:, -n:]
    perm = [(i, i + 1) for i in range(env.n_time - 1)]
    return lax.ppermute(src, env.time_axis, perm)


def halo_right(x: jax.Array, n: int, env: SeqParEnv) -> jax.Array:
    """First ``n`` time samples of the RIGHT neighbor (zeros on the last
    shard)."""
    if n == 0:
        return x[:, :0]
    src = x[:, :n]
    perm = [(i + 1, i) for i in range(env.n_time - 1)]
    return lax.ppermute(src, env.time_axis, perm)


def global_cumsum(x: jax.Array, env: SeqParEnv) -> jax.Array:
    """Cumsum along global time for a time-sharded (B, T_loc) array:
    local cumsum + exclusive prefix of shard totals (one tiny
    all_gather)."""
    loc = jnp.cumsum(x, axis=1)
    totals = lax.all_gather(loc[:, -1], env.time_axis)     # (n, B)
    k = tidx(env)
    mask = (jnp.arange(env.n_time) < k).astype(x.dtype)
    offset = jnp.einsum("n,nb->b", mask, totals)
    return loc + offset[:, None]


def global_wrapped_cumsum(x: jax.Array, env: SeqParEnv,
                          block: Optional[int] = None) -> jax.Array:
    """Global-time inclusive cumsum mod 1 of a time-sharded (B, T_loc)
    array, bit-matching ``ops.dsp.wrapped_cumsum`` on the gathered signal.

    Same blocked algorithm: per-block local cumsums are computed shard-
    locally (identical values in identical order), the wrapped block
    totals are all-gathered (nb_glob scalars per row — tiny), and EVERY
    shard runs the identical global mod-1 associative scan over them, so
    the block offsets — and hence the outputs — round exactly like the
    unsharded canonical form. Requires ``T_loc % block == 0`` (the same
    alignment class as the hop-divisibility constraints elsewhere in this
    module); falls back to ``global_cumsum(x) % 1`` otherwise, which is
    correct but carries ulp(T-scale) conditioning instead.
    """
    from ..ops.dsp import PHASE_BLOCK
    blk = PHASE_BLOCK if block is None else block
    b, tl = x.shape
    if tl % blk != 0:
        return global_cumsum(x, env) % 1
    nb_loc = tl // blk

    def impl(z):
        local = jnp.cumsum(z.reshape(b, nb_loc, blk), axis=-1)
        totals = local[..., -1] % 1                      # (B, nb_loc)
        tot_glob = lax.all_gather(totals, env.time_axis, axis=1,
                                  tiled=True)            # (B, nb_glob)
        off = lax.associative_scan(lambda u, v: (u + v) % 1, tot_glob,
                                   axis=1)
        off_excl = jnp.concatenate(
            [jnp.zeros_like(off[:, :1]), off[:, :-1]], axis=1)
        off_loc = lax.dynamic_slice_in_dim(
            off_excl, tidx(env) * nb_loc, nb_loc, axis=1)
        out = (local % 1 + off_loc[..., None]) % 1
        return out.reshape(b, tl)

    # Exact custom VJP (same identity as ops.dsp.wrapped_cumsum's): the
    # global cotangent is a REVERSED global cumsum, realized with two
    # global flips around a global cumsum — one ppermute pair + one
    # scalar all_gather instead of autodiff through the mod-scan.
    @jax.custom_vjp
    def f(z):
        return impl(z)

    def f_fwd(z):
        return impl(z), None

    def f_bwd(_, g):
        rev = global_flip(global_cumsum(global_flip(g, env), env), env)
        return (rev,)

    f.defvjp(f_fwd, f_bwd)
    return f(x)


def global_flip(x: jax.Array, env: SeqParEnv) -> jax.Array:
    """Reverse the global time axis of a time-sharded array: flip locally
    and mirror the shard order."""
    perm = [(i, env.n_time - 1 - i) for i in range(env.n_time)]
    return lax.ppermute(jnp.flip(x, 1), env.time_axis, perm)


def gather_time(x: jax.Array, env: SeqParEnv) -> jax.Array:
    """All-gather the global time axis (tiled): (B, T_loc) -> (B, T)."""
    return lax.all_gather(x, env.time_axis, axis=1, tiled=True)


def gather_sig(sig: Sig, env: SeqParEnv) -> Sig:
    return Sig(gather_time(sig.data, env), sig.hop)


def slice_global_rows(arr: jax.Array, env: SeqParEnv) -> jax.Array:
    """Slice this data-shard's batch rows out of a global-batch array."""
    b_loc = env.b_global // env.n_data
    r0 = (lax.axis_index(env.data_axis) * b_loc
          if env.data_axis else jnp.int32(0))
    return lax.dynamic_slice_in_dim(arr, r0, b_loc, axis=0)


# ---------------------------------------------------------------------------
# frame-rate -> local-window conversion
# ---------------------------------------------------------------------------

def localize(sig: Sig, env: SeqParEnv, to_hop: int = 1) -> Sig:
    """Replicated frame-rate ``Sig`` -> this shard's local window at
    ``to_hop``.

    Fuses the reference hop-algebra upsample (align-corners linear to
    ``(F-1)*hop+1`` points, ``models/utils.py:538-544``) with the window
    slice: rows ``[k*F_loc, k*F_loc + F_loc]`` inclusive reproduce the
    global interpolation exactly on samples ``[k*T_loc, (k+1)*T_loc)``.
    Past the last global row the window edge-holds; the affected suffix is
    excluded from the loss via ``env.valid_len``.
    """
    hop = sig.hop
    tl = env.t_local
    assert tl % hop == 0, (
        f"T_local={tl} must be a multiple of hop={hop} for time sharding")
    assert hop % to_hop == 0
    f_loc = tl // hop
    f_glob_needed = env.n_time * f_loc + 1
    d = sig.data
    f_have = d.shape[1]
    if f_have < f_glob_needed:
        # edge-hold rows; the valid prefix ends where real frames end
        pad = f_glob_needed - f_have
        d = jnp.concatenate(
            [d, jnp.repeat(d[:, -1:], pad, axis=1)], axis=1)
        env.shrink_valid((f_have - 1) * hop + 1)
    row0 = tidx(env) * f_loc
    win = lax.dynamic_slice_in_dim(d, row0, f_loc + 1, axis=1)
    if to_hop == hop:
        return Sig(win[:, :f_loc], hop)
    factor = hop // to_hop
    up = linear_upsample(win, factor, axis=1)       # (B, f_loc*factor + 1)
    return Sig(up[:, : tl // to_hop], to_hop)


def localize_frames(sig: Sig, env: SeqParEnv) -> Sig:
    """Replicated frame-rate ``Sig`` -> this shard's frame rows (no
    upsample): rows ``[k*F_loc, (k+1)*F_loc)``."""
    hop = sig.hop
    tl = env.t_local
    assert tl % hop == 0, (tl, hop)
    f_loc = tl // hop
    d = sig.data
    need = env.n_time * f_loc
    if d.shape[1] < need:
        pad = need - d.shape[1]
        d = jnp.concatenate(
            [d, jnp.repeat(d[:, -1:], pad, axis=1)], axis=1)
        env.shrink_valid(d.shape[1] * hop - pad * hop)
    win = lax.dynamic_slice_in_dim(d, tidx(env) * f_loc, f_loc, axis=1)
    return Sig(win, hop)


def upsample_local(x: jax.Array, k: int, env: SeqParEnv) -> jax.Array:
    """Align-corners linear upsample of a time-sharded (B, T_loc) array by
    ``k`` with a 1-sample right halo, so segment interpolation is exact
    across shard boundaries. Output (B, T_loc*k); global samples past
    ``(T-1)*k`` (which do not exist in the unsharded result) are zeroed.
    """
    if k == 1:
        return x
    nxt = halo_right(x, 1, env)
    # last shard has no right neighbor: edge-hold (values are zeroed below)
    is_last = tidx(env) == env.n_time - 1
    nxt = jnp.where(is_last, x[:, -1:], nxt)
    up = linear_upsample(jnp.concatenate([x, nxt], axis=1), k, axis=1)
    up = up[:, : x.shape[1] * k]
    # zero the beyond-signal suffix on the last shard: global upsampled
    # length is (T-1)*k + 1
    g0 = tidx(env) * x.shape[1] * k
    gidx = g0 + jnp.arange(x.shape[1] * k)
    return jnp.where(gidx <= (env.t_global - 1) * k, up, 0.0)


def slice_global_rng(key: jax.Array, shape_global: Tuple[int, int],
                     env: SeqParEnv, kind: str = "normal",
                     dtype=jnp.float32, **kw) -> jax.Array:
    """Draw over the GLOBAL (B, T) shape and slice this shard's window,
    so rng values are independent of the mesh layout (exact parity with
    the unsharded step). The unsliced remainder is dead code XLA can
    elide."""
    b_g, t_g = shape_global
    if kind == "normal":
        full = jax.random.normal(key, shape_global, dtype)
    elif kind == "uniform":
        full = jax.random.uniform(key, shape_global, dtype, **kw)
    else:
        raise ValueError(kind)
    b_loc = b_g // env.n_data
    t_loc = t_g // env.n_time
    r0 = (lax.axis_index(env.data_axis) * b_loc
          if env.data_axis else jnp.int32(0))
    c0 = tidx(env) * t_loc
    return lax.dynamic_slice(full, (r0, c0), (b_loc, t_loc))


# ---------------------------------------------------------------------------
# sharded all-pole (affine-summary boundary exchange) with custom VJP
# ---------------------------------------------------------------------------

def _divisor_block(t: int) -> int:
    """Largest divisor of t in [8, 1024] closest to sqrt(t); falls back to
    t (sequential) for awkward lengths. The affine end-state summary must
    NOT zero-pad to a block multiple: a zero-coefficient padded step
    shifts zeros into the tracked state and corrupts the chunk's end-state
    map (caught by the order-22 T=57600 parity test)."""
    import math as _math
    target = max(8, int(_math.sqrt(t)))
    best = None
    for l in range(8, min(t, 1024) + 1):
        if t % l == 0:
            if best is None or abs(l - target) < abs(best - target):
                best = l
    return best or t


def _local_affine_summary(x: jax.Array, a: jax.Array, block_size: int):
    """Affine end-state map (M, v) of a full local chunk:
    s_out = M s_in + v."""
    bsz, t = x.shape
    p = a.shape[-1]
    l = _divisor_block(t)
    k = t // l
    xp = x.reshape(bsz, k, l)
    ap = a.reshape(bsz, k, l, p)

    # the `+ 0 * xp[...]` ties the carry's device-varying type to the
    # input's so the scan type-checks under shard_map vma tracking
    eye = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(p, dtype=x.dtype),
                         jnp.zeros((p, 1), x.dtype)], axis=1),
        (bsz, k, p, p + 1)) + 0 * xp[:, :, :1, None]

    def step(w, inp):
        x_t, a_t = inp
        r = -jnp.einsum("bkp,bkpq->bkq", a_t, w)
        r = r.at[..., p].add(x_t)
        w = jnp.concatenate([r[:, :, None, :], w[:, :, :-1, :]], axis=2)
        return w, None

    w_end, _ = lax.scan(step, eye,
                        (jnp.moveaxis(xp, 2, 0), jnp.moveaxis(ap, 2, 0)))
    m_blk = w_end[..., :p]
    v_blk = w_end[..., p]

    def combine(e1, e2):
        m1, v1 = e1
        m2, v2 = e2
        return (jnp.einsum("bkij,bkjl->bkil", m2, m1),
                jnp.einsum("bkij,bkj->bki", m2, v1) + v2)

    m_cum, v_cum = lax.associative_scan(combine, (m_blk, v_blk), axis=1)
    return m_cum[:, -1], v_cum[:, -1]     # (B, p, p), (B, p)


def _allpole_sharded_fwd(x: jax.Array, a: jax.Array, env: SeqParEnv,
                         block_size: Optional[int] = None) -> jax.Array:
    """Forward time-sharded all-pole INSIDE an active shard_map body.
    x: (B, T_loc); a: (B, T_loc, p)."""
    from ..ops.allpole import _allpole_impl, _choose_block
    p = a.shape[-1]
    bs = block_size or _choose_block(x.shape[1])
    m_dev, v_dev = _local_affine_summary(x, a, bs)
    m_all = lax.all_gather(m_dev, env.time_axis)     # (n, B, p, p)
    v_all = lax.all_gather(v_dev, env.time_axis)
    k = tidx(env)

    def compose(carry, mv):
        m, v = mv
        new = jnp.einsum("bij,bj->bi", m, carry) + v
        return new, carry

    zi0 = jnp.zeros((x.shape[0], p), x.dtype) + 0 * x[:, :1]
    _, prefixes = lax.scan(compose, zi0, (m_all, v_all))
    s_in = prefixes[k]
    return _allpole_impl(x, a, s_in, bs)


def _shift_columns_sharded(a: jax.Array, env: SeqParEnv) -> jax.Array:
    """Sharded version of ``ops.allpole._shift_columns``:
    c[:, n, j] = a_global[:, n + j + 1, j] needs a right halo of p rows."""
    p = a.shape[-1]
    ext = jnp.concatenate([a, halo_right(a, p, env)], axis=1)
    cols = [ext[:, j + 1: j + 1 + a.shape[1], j] for j in range(p)]
    return jnp.stack(cols, axis=-1)


def _delayed_stack_sharded(y: jax.Array, p: int, env: SeqParEnv) -> jax.Array:
    """d[:, n, j] = y_global[:, n - j - 1]: left halo of p samples."""
    ext = jnp.concatenate([halo_left(y, p, env), y], axis=1)
    cols = [ext[:, p - j - 1: p - j - 1 + y.shape[1]] for j in range(p)]
    return jnp.stack(cols, axis=-1)


def allpole_sharded(x: jax.Array, a: jax.Array, env: SeqParEnv,
                    block_size: Optional[int] = None) -> jax.Array:
    """Differentiable time-sharded all-pole filter, for use INSIDE a
    shard_map body. Same O(T) adjoint as the single-chip kernel
    (``ops/allpole.py``): the cotangent is filtered globally-time-reversed
    through the sharded forward with halo-shifted coefficients."""
    static = _EnvStatic(env, block_size)
    return _allpole_sharded_vjp(x.astype(jnp.float32),
                                a.astype(jnp.float32), static)


class _EnvStatic:
    """Hashable wrapper so the env rides custom_vjp's nondiff slot."""

    def __init__(self, env: SeqParEnv, block_size: Optional[int]):
        self.env = env
        self.block_size = block_size

    def __hash__(self):
        e = self.env
        return hash((e.time_axis, e.n_time, e.data_axis, e.n_data,
                     e.t_global, e.b_global, self.block_size))

    def __eq__(self, other):
        return isinstance(other, _EnvStatic) and hash(self) == hash(other)


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _allpole_sharded_vjp(x, a, static):
    return _allpole_sharded_fwd(x, a, static.env, static.block_size)


def _as_fwd(x, a, static):
    y = _allpole_sharded_vjp(x, a, static)
    return y, (y, a)


def _as_bwd(static, res, g):
    env = static.env
    y, a = res
    p = a.shape[-1]
    c = _shift_columns_sharded(a, env)
    dxr = _allpole_sharded_fwd(global_flip(g, env), global_flip(c, env),
                               env, static.block_size)
    dx = global_flip(dxr, env)
    da = -dx[..., None] * _delayed_stack_sharded(y, p, env)
    return dx, da


_allpole_sharded_vjp.defvjp(_as_fwd, _as_bwd)


# ---------------------------------------------------------------------------
# sharded FIR building blocks
# ---------------------------------------------------------------------------

def fir_frame_conv_sharded(x: jax.Array, kernels_local: jax.Array,
                           hop: int, pad: int, correlate: bool,
                           env: SeqParEnv) -> jax.Array:
    """Frame-wise FIR over a time-sharded signal (the LTV zero-/min-phase
    FIR realization, reference ``models/filters.py:340-384``): global
    zero-pad ``pad`` left / (K-1-pad) right becomes a halo exchange; each
    shard convolves its own frames.

    x: (B, T_loc); kernels_local: (B, F_loc, K) — this shard's kernel rows
    (from ``localize_frames``). Returns (B, T_loc).
    """
    from ..models.filters import _fft_frame_conv, _unfold
    k = kernels_local.shape[-1]
    tl = x.shape[1]
    assert tl % hop == 0
    f_loc = tl // hop
    right = k - 1 - pad + hop - 1
    ext = jnp.concatenate(
        [halo_left(x, pad, env), x, halo_right(x, right, env)], axis=1)
    frames = _unfold(ext, k + hop - 1, hop)[:, :f_loc]
    out = _fft_frame_conv(frames, kernels_local[:, :f_loc], hop, correlate)
    return out.reshape(x.shape[0], tl)


def decimate_sharded(x: jax.Array, q: int, env: SeqParEnv,
                     kernel: Optional[np.ndarray] = None) -> jax.Array:
    """Anti-aliased decimation of a time-sharded signal ('same'-padded
    lowpass then stride — ``ops/resample.decimate`` semantics). Shard
    length must be a multiple of q."""
    from ..ops.resample import sinc_kernel
    if kernel is None:
        kernel = sinc_kernel(q)
    half = (kernel.shape[0] - 1) // 2
    tl = x.shape[1]
    assert tl % q == 0
    ext = jnp.concatenate(
        [halo_left(x, half, env), x, halo_right(x, half, env)], axis=1)
    kj = jnp.asarray(kernel, x.dtype)
    n = ext.shape[1] + kernel.shape[0] - 1
    nfft = 1 << (n - 1).bit_length()
    conv = jnp.fft.irfft(
        jnp.fft.rfft(ext, nfft) * jnp.fft.rfft(kj, nfft), nfft)
    # valid part starts at 2*half into the full conv of ext
    return conv[..., 2 * half: 2 * half + tl: q]


def frame_ola_sharded(frames_fn, exg: jax.Array, window: np.ndarray,
                      hop: int, env: SeqParEnv) -> jax.Array:
    """Frame-process + windowed overlap-add of a time-sharded signal
    (the GOLF-ff LTVMinimumPhaseFilter realization, reference
    ``models/filters.py:140-184``).

    Frames (length W = len(window), stride hop, global zero-pad W/2) are
    owned by the shard containing their hop-start; each shard processes
    its F_loc = T_loc/hop frames via ``frames_fn((B, F_loc, W)) ->
    (B, F_loc, W)``, overlap-adds into a locally-extended buffer, and
    exchanges the spilled W/2 edges with its neighbors. The global
    windowed-ones normalization is a static vector sliced per shard.
    Output is (B, T_loc); the global tail past ``T - hop`` does not exist
    in the unsharded result and is excluded via ``env.valid_len``.
    """
    b, tl = exg.shape
    w = window.shape[0]
    pad = w // 2
    assert tl % hop == 0 and w % hop == 0 and pad <= tl, (tl, hop, w)
    f_loc = tl // hop
    window = np.asarray(window, np.float64)   # concrete: norm needs it
    win_j = jnp.asarray(window, exg.dtype)
    ext = jnp.concatenate(
        [halo_left(exg, pad, env), exg, halo_right(exg, pad, env)], axis=1)
    from ..models.filters import _unfold
    frames = _unfold(ext, w, hop)[:, :f_loc]
    filtered = frames_fn(frames) * win_j

    # local OLA into [k*T_loc - pad, (k+1)*T_loc + pad): strip j of every
    # frame lands on one contiguous stride-hop run
    buf = jnp.zeros((b, tl + 2 * pad), exg.dtype)
    for j in range(w // hop):
        strip = filtered[:, :, j * hop:(j + 1) * hop].reshape(b, tl)
        buf = buf.at[:, j * hop: j * hop + tl].add(strip)
    # exchange spilled edges: my left spill belongs to the left
    # neighbor's window and vice versa
    left_spill = buf[:, :pad]                # covers [k*tl - pad, k*tl)
    right_spill = buf[:, -pad:]              # covers [(k+1)*tl, +pad)
    from_left = halo_left(right_spill, pad, env)   # their right spill
    from_right = halo_right(left_spill, pad, env)  # their left spill
    y = buf[:, pad:-pad]
    y = y.at[:, :pad].add(from_left)
    y = y.at[:, -pad:].add(from_right)

    # static global normalization (windowed-ones OLA over all frames)
    f_glob = env.n_time * f_loc
    norm = np.zeros(env.t_global + 2 * pad)
    for i in range(f_glob):
        norm[i * hop: i * hop + w] += window
    norm = np.maximum(norm[pad:pad + env.t_global], 1e-9)
    norm_j = jnp.asarray(norm, exg.dtype)
    seg = lax.dynamic_slice_in_dim(norm_j, tidx(env) * tl, tl)
    env.shrink_valid((f_glob - 1) * hop)
    return y / seg[None, :]


def stft_filter_sharded(x: jax.Array, h_local: jax.Array, n_fft: int,
                        hop: int, window: str, env: SeqParEnv,
                        onesided: bool = True) -> jax.Array:
    """STFT-domain LTV filtering of a time-sharded signal: analysis
    window -> FFT -> per-frame transfer multiply -> IFFT -> synthesis
    window -> OLA with window^2 normalization (``ops/stft.py`` stft/istft
    semantics, torch-compatible reflect center padding). This is the
    realization behind the MLSA / NHV-cepstral / ∇WORLD filter variants
    (reference ``models/filters.py:529-760``).

    Frame f (global, hop-start f*hop, reflect-padded coords) is owned by
    shard ``f // F_loc``; ``h_local`` is (B, F_loc, bins) — this shard's
    transfer rows (real or complex; bins = n_fft//2+1 if onesided else
    n_fft). Matches the unsharded path, which uses exactly F = T/hop
    frames (``min(spec_frames, ctrl_frames)``) and whose istft output has
    global length T - hop: the invalid tail is excluded via
    ``env.valid_len``. Output (B, T_loc).
    """
    from ..ops.dsp import get_window_fn
    b, tl = x.shape
    pad = n_fft // 2
    assert tl % hop == 0 and pad <= tl - 2, (tl, hop, n_fft)
    f_loc = tl // hop
    k = tidx(env)
    is_last = k == env.n_time - 1

    win_np = np.asarray(get_window_fn(window)(n_fft), np.float64)
    win = jnp.asarray(win_np, x.dtype)

    # local buffer of reflect-padded global coords [k*tl, k*tl + tl + 2p):
    # interior shards exchange halos; the global edges reflect own samples
    # (padded[j] = x[pad - j], padded[T + pad + j] = x[T - 2 - j]).
    left = jnp.where(k == 0, x[:, 1:pad + 1][:, ::-1],
                     halo_left(x, pad, env))
    right = jnp.where(is_last, x[:, tl - 2: tl - 2 - pad: -1],
                      halo_right(x, pad, env))
    ext = jnp.concatenate([left, x, right], axis=1)

    from ..models.filters import _unfold
    frames = _unfold(ext, n_fft, hop)[:, :f_loc] * win
    if onesided:
        spec = jnp.fft.rfft(frames)
        out_f = jnp.fft.irfft(spec * h_local[:, :f_loc], n_fft)
    else:
        spec = jnp.fft.fft(frames)
        out_f = jnp.fft.ifft(spec * h_local[:, :f_loc]).real
    out_f = out_f.astype(x.dtype) * win

    # scatter-OLA into [k*tl - pad, (k+1)*tl + pad) then exchange the
    # spilled pad-sample edges with the neighbors (frame_ola_sharded
    # pattern, but hop need not divide n_fft)
    buf = jnp.zeros((b, tl + 2 * pad), x.dtype)
    idx = (jnp.arange(f_loc)[:, None] * hop
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    buf = buf.at[:, idx].add(out_f.reshape(b, -1))
    from_left = halo_left(buf[:, -pad:], pad, env)
    from_right = halo_right(buf[:, :pad], pad, env)
    y = buf[:, pad:-pad]
    y = y.at[:, :pad].add(from_left)
    y = y.at[:, -pad:].add(from_right)

    # static window^2 normalization over all F = n*F_loc global frames,
    # in padded coords, trimmed to the unpadded window (istft semantics)
    f_glob = env.n_time * f_loc
    wsq = np.zeros(env.t_global + 2 * pad)
    for i in range(f_glob):
        wsq[i * hop: i * hop + n_fft] += win_np * win_np
    wsq = np.maximum(wsq[pad:pad + env.t_global], 1e-11)
    seg = lax.dynamic_slice_in_dim(
        jnp.asarray(wsq, x.dtype), k * tl, tl)
    # istft(out_len = n_fft + hop*(F-1), center-trim) -> global T - hop
    env.shrink_valid(env.t_global - hop)
    return y / seg[None, :]


# ---------------------------------------------------------------------------
# sharded STFT magnitude-loss terms
# ---------------------------------------------------------------------------

def sharded_frames(x: jax.Array, n_fft: int, hop: int, env: SeqParEnv,
                   valid_len: int, pad_mode: str = "reflect"
                   ) -> Tuple[jax.Array, jax.Array, int]:
    """Extract this shard's STFT frames of the global valid signal
    (center=True semantics) with halo exchange.

    Returns (frames (B, F_max, n_fft), mask (F_max,), f_global):
    masked frame slots are garbage and must be excluded from reductions.
    Frame f (global) covers padded coords [f*hop, f*hop+n_fft) where the
    padded signal is reflect-padded by n_fft//2 on both ends; frame f is
    owned by the shard whose range contains its unpadded start
    ``f*hop - pad`` (clamped — early frames belong to shard 0).
    """
    b, tl = x.shape
    n = env.n_time
    pad = n_fft // 2
    assert tl >= n_fft + hop, (tl, n_fft)
    tail_invalid = env.n_time * tl - valid_len
    assert tail_invalid < tl, "invalid tail must live on the last shard"
    # right-edge reflection must not run off the last shard's valid part
    assert tl - tail_invalid >= n_fft + hop + 2, (tl, tail_invalid, n_fft)

    f_global = 1 + (valid_len + 2 * pad - n_fft) // hop
    f_max = tl // hop + 2

    k = tidx(env)
    is_last = k == n - 1

    # local buffer in padded coords: [k*tl, k*tl + tl + pad + n_fft + hop)
    # = own samples + right halo, with shard-0's left reflect pad
    # prepended (only ever indexed on shard 0).
    halo_r = halo_right(x, min(tl, n_fft + hop), env)
    # right-edge reflect for the LAST shard, built from the valid tail:
    # padded[T_valid + pad + j] = x[T_valid - 2 - j] (torch reflect)
    tv_loc = tl - tail_invalid      # valid samples on the last shard
    # halo_r slot r sits at padded coord p + T_glob + r = p + T_valid +
    # (tail_invalid + r): reflect index T_valid - 2 - (tail_invalid + r)
    ridx = jnp.arange(halo_r.shape[1])
    refl_src = jnp.clip(tv_loc - 2 - tail_invalid - ridx, 0, tl - 1)
    right_edge = x[:, refl_src]
    halo_r = jnp.where(is_last, right_edge, halo_r)
    # on the last shard, samples in [tv_loc, tl) are invalid: the frames
    # that touch them re-read the reflected values instead
    own = x
    if tail_invalid > 0:
        jj = jnp.arange(tl)
        own_refl = jnp.clip(2 * (tv_loc - 1) - jj, 0, tl - 1)
        own = jnp.where(is_last & (jj >= tv_loc)[None, :],
                        x[:, own_refl], x)

    # buf[s] must hold padded coord k*tl + s. For s < pad that is
    # x_global[k*tl + s - pad]: the left neighbor's tail (halo) on k>0,
    # the global reflect pad (own samples x[1..pad] reversed) on shard 0.
    left_reflect = x[:, 1:pad + 1][:, ::-1]
    left_part = jnp.where(k == 0, left_reflect,
                          halo_left(x, pad, env))
    buf = jnp.concatenate([left_part, own, halo_r], axis=1)
    # buf coords: sample s of buf = padded coord (k*tl) + s  - pad... :
    # buf[0] is padded coord k*tl (for k=0 this is the reflect region
    # start thanks to the prepended pad; for k>0 buf[0..pad) is unused).
    # Actually: padded coord of buf[s] = k*tl + s  (since padded signal
    # index = unpadded + pad, and buf[pad] = x_local[0] = unpadded k*tl).

    # first frame owned by this shard: smallest f with f*hop >= k*tl
    # for k>0; shard 0 owns all f with f*hop < tl (including the early
    # reflect frames).
    first_f = jnp.where(k == 0, 0, -(-(k * tl) // hop))
    slot = jnp.arange(f_max)
    f_ids = first_f + slot
    next_first = -(-((k + 1) * tl) // hop)
    mask = (f_ids < jnp.where(is_last, f_global,
                              jnp.minimum(next_first, f_global)))
    # buffer position of frame f: padded coord f*hop -> buf index
    # f*hop - k*tl
    starts = jnp.clip(f_ids * hop - k * tl, 0,
                      buf.shape[1] - n_fft)
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = buf[:, idx]                          # (B, F_max, n_fft)
    return frames, mask.astype(x.dtype), f_global


def sss_loss_sharded(pred: jax.Array, target: jax.Array, n_fft: int,
                     hop: int, alpha: float, window: str, eps: float,
                     env: SeqParEnv) -> jax.Array:
    """Sharded SSSLoss (|STFT| L1 + alpha * log2-mag L1) equal to the
    unsharded value on the global valid prefix."""
    from ..ops.dsp import get_window_fn
    valid = env.valid_len or env.t_global
    w = jnp.asarray(get_window_fn(window)(n_fft), pred.dtype)
    fp, mask, f_glob = sharded_frames(pred, n_fft, hop, env, valid)
    ft, _, _ = sharded_frames(target, n_fft, hop, env, valid)
    sp = jnp.abs(jnp.fft.rfft(fp * w))
    st = jnp.abs(jnp.fft.rfft(ft * w))
    lin = jnp.sum(jnp.abs(sp - st) * mask[None, :, None])
    log = jnp.sum(jnp.abs(jnp.log2(st + eps) - jnp.log2(sp + eps))
                  * mask[None, :, None])
    lin = lax.psum(lin, env.time_axis)
    log = lax.psum(log, env.time_axis)
    denom = pred.shape[0] * f_glob * (n_fft // 2 + 1)
    return (lin + alpha * log) / denom


# ---------------------------------------------------------------------------
# (data x time)-mesh training step
# ---------------------------------------------------------------------------

def pad_to_alignment(x: jax.Array, f0: jax.Array, n_time: int, align: int
                     ) -> Tuple[jax.Array, jax.Array, int]:
    """Pad an arbitrary-length (B, T) batch so it can take the sharded
    step: T -> the next multiple of ``n_time * align``, where ``align`` is
    the LCM of every frame hop in the model (2400 for the GOLF wavetable
    hop of 240 * hop_rate 10; the encoder/noise/room hops divide it).

    Audio is zero-padded; f0 is EDGE-padded — a zero-f0 pad run would flip
    the tail to unvoiced and change the oscillator phase history, whereas
    a held f0 over silent input only appends deterministic synth output
    that both the sharded and unsharded steps see identically.

    Returns ``(x_pad, f0_pad, t_orig)``. Shapes are static under jit (T is
    a trace-time constant), so this is usable both host-side and inside a
    jitted step. The sharded-step contract on padded input is exact parity
    with the single-device step ON THE PADDED BATCH
    (tests/test_seqpar.py::test_seqpar_padded_arbitrary_length_matches).
    """
    t = x.shape[1]
    unit = n_time * align
    t_pad = -(-t // unit) * unit
    if t_pad == t:
        return x, f0, t
    pw = ((0, 0), (0, t_pad - t))
    return (jnp.pad(x, pw), jnp.pad(f0, pw, mode="edge"), t)


def make_sharded_train_fn(task, mesh: Mesh, time_axis: str = "time",
                          data_axis: Optional[str] = "data",
                          pad_align: Optional[int] = None
                          ) -> Callable:
    """Build a jitted full-model training step over a (data x time) mesh.

    Hybrid partitioning — the TPU-idiomatic split:

    * the frame-rate neural encoder + ctrl transforms + aux losses run in
      the ordinary jit (GSPMD) region, where XLA auto-partitions dense NN
      work over the data axis;
    * the sample-rate decode chain and the MSS loss — where the memory
      and sequential structure live — run under ``shard_map`` with the
      time axis sharded and explicit boundary collectives (see module
      docstring).

    Because the shard_map boundary transposes replicated inputs with a
    psum, gradients of every parameter come out exactly equal to the
    single-device step (tests/test_seqpar.py).

    Returns ``fn(params, stats, batch_stats, x, f0, key) ->
    (loss, grads, metrics, mutated)`` operating on GLOBAL (B, T) arrays.

    With ``pad_align`` set (the LCM of the model's frame hops, e.g. 2400
    for GOLF), arbitrary-length batches are accepted: the step first pads
    T to the next multiple of ``n_time * pad_align`` via
    :func:`pad_to_alignment` (zero audio, edge-held f0), then runs the
    sharded step on the padded batch — exactly equal to the single-device
    step on that padded batch. Without it, T must already satisfy the
    per-op ``T_local % hop == 0`` constraints.
    """
    n_time = mesh.shape[time_axis]
    n_data = mesh.shape.get(data_axis, 1) if data_axis else 1
    da = data_axis if (data_axis and n_data > 1) else None

    def step(params, stats, bstats, x, f0, key):
        if pad_align is not None:
            x, f0, _ = pad_to_alignment(x, f0, n_time, pad_align)
        t_glob = x.shape[1]
        b_glob = x.shape[0]

        def unsharded_decode_len(p, bs, ctrl_p, phase_sig, voicing_sig,
                                 key):
            """Static output length of the UNSHARDED decoder on the global
            shapes (trace-only via eval_shape). The single-device step's
            criterion integrates over exactly this support, so the sharded
            criterion must clamp ``valid_len`` to it — per-op shrink calls
            alone can overestimate it when a module's unsharded twin
            truncates based on an upstream stage's already-shortened
            output (e.g. the MLSA istft after a frame-OLA noise filter)."""
            def run(pp, bb, mm, kk):
                return task.apply(
                    {"params": pp, "batch_stats": bb},
                    rngs={"noise": kk, "dropout": kk},
                    method=lambda m: m.decoder(**mm))
            merged = dict(ctrl_p)
            merged["phase"] = phase_sig
            if voicing_sig is not None:
                merged["voicing"] = voicing_sig
            out = jax.eval_shape(run, p, bs, merged, key)
            return out.data.shape[1]

        def decode_body(p, bs, ctrl_p, phase_sig, voicing_sig, x_loc,
                        valid0=None):
            env = SeqParEnv(time_axis=time_axis, n_time=n_time,
                            t_global=t_glob, b_global=b_glob,
                            data_axis=da, n_data=n_data,
                            valid_len=valid0)
            with activate(env):
                merged = dict(ctrl_p)
                merged["phase"] = phase_sig
                if voicing_sig is not None:
                    merged["voicing"] = voicing_sig
                x_hat = task.apply(
                    {"params": p, "batch_stats": bs},
                    rngs={"noise": key, "dropout": key},
                    method=lambda m: m.decoder(**merged))
                t = min(x_hat.shape[1], x_loc.shape[1])
                mss = task.criterion(x_hat.data[:, :t], x_loc[:, :t])
            if da:
                mss = lax.pmean(mss, da)
            return mss

        def loss_fn(p):
            variables = {"params": p, "stats": stats,
                         "batch_stats": bstats}
            # --- GSPMD region: encoder, phase prep, ctrl transforms ------
            (dec_params, f0_hat, voicing_logits), mut = task.apply(
                variables, Sig(x, 1), Sig(f0, 1), True,
                rngs={"noise": key, "dropout": key},
                mutable=["stats", "batch_stats"],
                method=lambda m, *a: m.prepare_training(*a))
            raw = {k: v for k, v in dec_params.items()
                   if k.endswith("_params")}
            other = {k: v for k, v in dec_params.items()
                     if not k.endswith("_params")}
            ctrl_params = task.apply(
                variables, raw, method=lambda m, r: m.decoder.apply_ctrl(r))
            phase_sig = other.pop("phase")
            assert phase_sig.hop == 1, (
                "time sharding expects a sample-rate phase signal")
            voicing_sig = other.pop("voicing", None)
            assert not other, f"unexpected decoder inputs: {list(other)}"

            # --- shard_map region: sample-rate decode + sharded MSS ------
            valid0 = unsharded_decode_len(
                p, bstats, ctrl_params, phase_sig, voicing_sig, key)
            dspec = P(da) if da else P()
            xspec = P(da, time_axis)
            mss = shard_map(
                lambda *a: decode_body(*a, valid0=valid0), mesh=mesh,
                in_specs=(P(), P(), dspec, xspec, dspec, xspec),
                # check_vma=False: jnp.fft AD mis-types cotangents under
                # vma tracking (jax 0.9.0); differentiation happens
                # OUTSIDE this shard_map, so the body is a pure linear
                # transpose and replication typing is not needed —
                # P() inputs transpose to psum structurally.
                out_specs=P(), check_vma=False)(
                p, bstats, ctrl_params, phase_sig, voicing_sig, x)

            aux, metrics = task.aux_losses(
                f0_hat, voicing_logits, ctrl_params, Sig(f0, 1))
            loss = mss + aux
            metrics["loss"] = loss
            return loss, (metrics, mut)

        (loss, (metrics, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, grads, metrics, mut

    return jax.jit(step)
