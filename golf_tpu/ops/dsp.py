"""Pure-XLA DSP math primitives.

TPU-native re-implementations of the reference's DSP utility layer
(``models/utils.py:403-593``). Everything here is shape-static and
jit/vmap/grad friendly; matmul-heavy formulations are preferred so XLA can
place the work on the MXU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import get_window as _scipy_get_window


# ---------------------------------------------------------------------------
# Wrapped (mod-1) phase integration
# ---------------------------------------------------------------------------

PHASE_BLOCK = 240


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def wrapped_cumsum(x: jax.Array, block: int = PHASE_BLOCK) -> jax.Array:
    """Inclusive cumsum of ``x`` along time (dim 1), reduced mod 1, with
    bounded rounding error independent of the signal length.

    A plain ``cumsum(x) % 1`` accumulates an unwrapped fp32 phase whose
    magnitude grows without bound, so the wrapped result carries
    ``ulp(cumsum[-1])`` of error — at minutes-scale T the per-sample phase
    error reaches audible levels once scaled by a harmonic index. Here the
    accumulation wraps as it goes: per-block local cumsums (magnitude
    <= block/2 cycles) plus a mod-1 associative scan over the wrapped block
    totals (all intermediates in [0, 2)), so the error stays
    ~ulp(block/2) + depth*ulp(2) for any T.

    The mod-1 reduction is exact for every integer-harmonic consumer:
    ``sin(2*pi*k*(c % 1)) == sin(2*pi*k*c)`` and wavetable lookups index by
    ``c % 1``. ``seqpar.global_wrapped_cumsum`` reproduces this function's
    exact fp behavior on a time-sharded array when the shard length is a
    multiple of ``block``.
    """
    b, t = x.shape
    nb = -(-t // block)
    xp = jnp.pad(x, ((0, 0), (0, nb * block - t)))
    local = jnp.cumsum(xp.reshape(b, nb, block), axis=-1)
    totals = local[..., -1] % 1
    off = jax.lax.associative_scan(lambda u, v: (u + v) % 1, totals, axis=1)
    off_excl = jnp.concatenate(
        [jnp.zeros_like(off[:, :1]), off[:, :-1]], axis=1)
    out = (local % 1 + off_excl[..., None]) % 1
    return out.reshape(b, nb * block)[:, :t]


def _wrapped_cumsum_fwd(x, block):
    return wrapped_cumsum(x, block), None


def _wrapped_cumsum_bwd(block, _, g):
    # d out_t / d x_s = 1[s <= t] a.e. (the mod-1 wraps have unit slope),
    # so the cotangent is a REVERSED inclusive cumsum — one cheap scan
    # instead of autodiff through the blocked associative mod-scan
    # (whose transpose is a ~60-op elementwise storm at (B, nb, block)).
    return (jnp.flip(jnp.cumsum(jnp.flip(g, 1), axis=1), 1),)


wrapped_cumsum.defvjp(_wrapped_cumsum_fwd, _wrapped_cumsum_bwd)


# ---------------------------------------------------------------------------
# Windows (reference ``models/utils.py:417-430``)
# ---------------------------------------------------------------------------

def get_window_fn(window: str = "hann") -> Callable[[int], np.ndarray]:
    """Window registry. torch.*_window defaults are periodic; scipy's are
    symmetric — replicate torch semantics (periodic=True) for the named four,
    scipy symmetric otherwise (matching the reference's fallback)."""
    torch_like = {"hann", "hanning", "hamming", "blackman", "bartlett"}

    def fn(n: int) -> np.ndarray:
        if n == 1:
            return np.ones(1)
        if window in torch_like:
            name = {"hanning": "hann"}.get(window, window)
            # periodic window == symmetric window of length n+1, drop last
            return _scipy_get_window(name, n, fftbins=True).astype(np.float64)
        return np.asarray(_scipy_get_window(window, n), dtype=np.float64)

    return fn


# ---------------------------------------------------------------------------
# FIR filtering as batched matmul (reference ``fir_filt``,
# ``models/utils.py:433-441``): causal per-sample time-varying FIR.
# ---------------------------------------------------------------------------

def unfold(x: jax.Array, size: int, step: int) -> jax.Array:
    """Sliding windows (..., T) -> (..., F, size), GATHER-FREE.

    Fancy-index framing lowers to XLA's serial gather on TPU and its
    backward to scatter-add (the round-4 MSS-framing finding,
    ``ops/stft.py::frame_signal``). Blockify x at the step and build each
    window from ``q = ceil(size/step)`` shifted block views — pure
    slices + concat, whose transpose is pads + adds.
    """
    t = x.shape[-1]
    n_frames = (t - size) // step + 1
    q, rem = divmod(size, step)
    rows = n_frames + q
    target = rows * step
    lead = x.shape[:-1]
    if target >= t:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, target - t)])
    else:
        # windows never read past (n_frames-1)*step + size - 1 < target
        x = x[..., :target]
    blk = x.reshape(*lead, rows, step)
    parts = [blk[..., k:k + n_frames, :] for k in range(q)]
    if rem:
        parts.append(blk[..., q:q + n_frames, :rem])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def fir_filt(x: jax.Array, h: jax.Array) -> jax.Array:
    """y[n] = sum_k h[n, k] * x[n - (K-1) + k]  — i.e. h is flipped like the
    reference: ``h.flip(-1)`` against causally padded windows.

    x: (B, T), h: (B, T, K). Returns (B, T).

    Realized as K shifted slices of x (no (T, K) gather: its backward is
    a scatter-add over B*T*K elements); with h flipped once this is
    y = sum_k h_f[:, :, k] * xp[:, k : k + T].
    """
    k = h.shape[-1]
    t = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0)))
    hf = jnp.flip(h, -1)
    if k <= 128:
        y = hf[:, :, 0] * xp[:, :t]
        for j in range(1, k):
            y = y + hf[:, :, j] * xp[:, j:j + t]
        return y
    frames = unfold(xp, k, 1)[:, :t]              # (B, T, K)
    return jnp.einsum("btk,btk->bt", frames, hf)


def fir_filt_conv(x: jax.Array, h: jax.Array) -> jax.Array:
    """Single (time-invariant) causal FIR via conv: x (B,T), h (K,)."""
    k = h.shape[-1]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0)))[:, None, :]
    out = jax.lax.conv_general_dilated(
        xp, jnp.flip(h)[None, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# Polynomial products (reference ``coeff_product``,
# ``models/utils.py:444-460``): divide & conquer product of polynomials.
# ---------------------------------------------------------------------------

def poly_product_pair(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Full convolution of polynomial coefficient arrays along last dim.
    c1: (..., n), c2: (..., m) -> (..., n+m-1)."""
    n, m = c1.shape[-1], c2.shape[-1]
    out_len = n + m - 1
    f1 = jnp.fft.rfft(c1, 2 * out_len)
    f2 = jnp.fft.rfft(c2, 2 * out_len)
    prod = jnp.fft.irfft(f1 * f2, 2 * out_len)[..., :out_len]
    return prod


def _poly_product_pair_direct(c1: jax.Array, c2: jax.Array) -> jax.Array:
    n, m = c1.shape[-1], c2.shape[-1]
    out_len = n + m - 1
    # outer product then sum anti-diagonals via padding trick
    outer = c1[..., :, None] * c2[..., None, :]  # (..., n, m)
    out = jnp.zeros(c1.shape[:-1] + (out_len,), dtype=outer.dtype)
    for i in range(n):
        out = out.at[..., i:i + m].add(outer[..., i, :])
    return out


def coeff_product(polynomials: jax.Array) -> jax.Array:
    """Product of N polynomials: (N, B, k) -> (B, (k-1)*N + 1).

    Divide-and-conquer tree exactly like the reference so grouping (and thus
    float rounding) is comparable. Small degree → direct convolution.
    """
    n = polynomials.shape[0]
    if n == 1:
        return polynomials[0]
    c1 = coeff_product(polynomials[n // 2:])
    c2 = coeff_product(polynomials[: n // 2])
    if c1.shape[-1] > c2.shape[-1]:
        c1, c2 = c2, c1
    return _poly_product_pair_direct(c2, c1)


# ---------------------------------------------------------------------------
# Biquad / LPC parameterisations (reference ``models/utils.py:463-525``)
# ---------------------------------------------------------------------------

def complex2biquads(roots: jax.Array) -> jax.Array:
    """Conjugate-root pairs -> [1, a1, a2] (reference :463-468)."""
    assert jnp.iscomplexobj(roots)
    a1 = -2 * roots.real
    a2 = jnp.abs(roots) ** 2
    return jnp.stack([jnp.ones_like(a1), a1, a2], axis=-1)


def params2biquads(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Stable biquad from two [-1, 1] params (reference :471-477)."""
    a1 = 2 * p1
    a1_abs = jnp.abs(a1)
    a2 = 0.5 * ((2 - a1_abs) * p2 + a1_abs)
    return jnp.stack([jnp.ones_like(a1), a1, a2], axis=-1)


def biquads2lpc(biquads: jax.Array) -> jax.Array:
    """(..., n_sections, 3) -> (..., 2*n_sections) LPC coeffs (drop leading 1).
    Reference :480-484."""
    assert biquads.shape[-1] == 3
    lead = biquads.shape[:-2]
    flat = biquads.reshape((-1,) + biquads.shape[-2:])  # (B', n, 3)
    prod = coeff_product(jnp.swapaxes(flat, 0, 1))      # (B', 2n+1)
    return prod.reshape(lead + (prod.shape[-1],))[..., 1:]


def get_logits2biquads(rep_type: str, max_abs_pole: float = 0.99) -> Callable:
    """Logits -> stable biquad coefficients; three parameterisations
    (reference :487-525)."""
    if rep_type == "coef":
        def f(logits):
            a1 = jnp.tanh(logits[..., 0]) * max_abs_pole * 2
            a1_abs = jnp.abs(a1)
            a2 = 0.5 * ((2 - a1_abs) * jnp.tanh(logits[..., 1]) * max_abs_pole
                        + a1_abs)
            return jnp.stack([jnp.ones_like(a1), a1, a2], axis=-1)
    elif rep_type == "conj":
        def f(logits):
            mag = jax.nn.sigmoid(logits[..., 0]) * max_abs_pole
            cos = jnp.tanh(logits[..., 1])
            return jnp.stack(
                [jnp.ones_like(mag), -2 * mag * cos, mag * mag], axis=-1)
    elif rep_type == "real":
        def f(logits):
            z1 = jnp.tanh(logits[..., 0]) * max_abs_pole
            z2 = jnp.tanh(logits[..., 1]) * max_abs_pole
            return jnp.stack(
                [jnp.ones_like(z1), -z1 - z2, z1 * z2], axis=-1)
    else:
        raise ValueError(f"Unknown rep_type: {rep_type}")
    return f


def rc2lpc(rc: jax.Array) -> jax.Array:
    """Reflection coefficients -> LPC via the step-up (Levinson) recursion
    (reference :581-593). rc: (..., order) in (-1, 1); returns (..., order)
    coefficients a1..ap of A(z) = 1 + sum a_i z^-i. Always stable."""
    order = rc.shape[-1]
    if order == 1:
        return rc
    k0 = rc[..., :1]
    cur = jnp.concatenate([jnp.ones_like(k0), k0], axis=-1)
    for n in range(1, order):
        prev = jnp.concatenate([cur, jnp.zeros_like(k0)], axis=-1)
        kn = rc[..., n:n + 1]
        cur = prev + kn * jnp.flip(prev, -1)
    return cur[..., 1:]


def lsp2lpc(lsp: jax.Array) -> jax.Array:
    """Line-spectral pairs (frequencies in (0, pi), ascending, first entry =
    w0) -> LPC polynomial [1, a1..ap].

    Same contract as diffsptk.functional.lsp2lpc used by the reference
    (``models/filters.py:82-86``): input (..., order+1) where element 0 is
    ignored (gain slot), elements 1..order are LSP frequencies; output
    (..., order+1) = [1, a...]; caller drops the leading 1.
    """
    w = lsp[..., 1:]
    order = w.shape[-1]
    # Split into P (symmetric) and Q (antisymmetric) root sets:
    # odd-indexed freqs -> one set, even -> the other.
    w1 = w[..., ::2]
    w2 = w[..., 1::2]

    def poly_from_cos(ws):
        # product over k of (1 - 2 cos(w_k) z^-1 + z^-2)
        c = jnp.cos(ws)
        bi = jnp.stack(
            [jnp.ones_like(c), -2 * c, jnp.ones_like(c)], axis=-1)
        lead = bi.shape[:-2]
        flat = bi.reshape((-1,) + bi.shape[-2:])
        if flat.shape[-2] == 0:
            return jnp.ones(lead + (1,), dtype=lsp.dtype)
        prod = coeff_product(jnp.swapaxes(flat, 0, 1))
        return prod.reshape(lead + (prod.shape[-1],))

    p1 = poly_from_cos(w1)
    p2 = poly_from_cos(w2)
    one = jnp.ones(p1.shape[:-1] + (1,), dtype=lsp.dtype)
    if order % 2 == 0:
        # P(z) = (1 - z^-1) prod_even,  Q(z) = (1 + z^-1) prod_odd
        d1 = jnp.concatenate([one, jnp.zeros_like(one)], -1) - \
            jnp.concatenate([jnp.zeros_like(one), one], -1)
        d2 = jnp.concatenate([one, jnp.zeros_like(one)], -1) + \
            jnp.concatenate([jnp.zeros_like(one), one], -1)
        P = _conv_last(p1, d1)
        Q = _conv_last(p2, d2)
    else:
        # odd order: P(z) = prod(w1) (no extra factor),
        # Q(z) = (1 - z^-2) prod(w2)
        P = p1
        dz2 = jnp.concatenate([one, jnp.zeros_like(one),
                               -one], -1)
        Q = _conv_last(p2, dz2)
    # A(z) = (P(z) + Q(z)) / 2
    L = max(P.shape[-1], Q.shape[-1])
    P = jnp.pad(P, [(0, 0)] * (P.ndim - 1) + [(0, L - P.shape[-1])])
    Q = jnp.pad(Q, [(0, 0)] * (Q.ndim - 1) + [(0, L - Q.shape[-1])])
    a = 0.5 * (P + Q)
    return a[..., :order + 1]


def _conv_last(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full 1-D convolution along the last axis (polynomial product)."""
    n, m = a.shape[-1], b.shape[-1]
    out = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
                    + (n + m - 1,), dtype=a.dtype)
    for i in range(m):
        out = out.at[..., i:i + n].add(a * b[..., i:i + 1])
    return out


def levinson(r: jax.Array, order: int) -> jax.Array:
    """Levinson-Durbin: autocorrelation (..., order+1) -> LPC [1, a1..ap].

    diffsptk-equivalent LPC analysis core (used by the LPCNet trainer and
    the mcep stack)."""
    a = jnp.zeros(r.shape[:-1] + (order + 1,), dtype=r.dtype)
    a = a.at[..., 0].set(1.0)
    err = r[..., 0]
    for i in range(1, order + 1):
        acc = r[..., i]
        for j in range(1, i):
            acc = acc + a[..., j] * r[..., i - j]
        k = -acc / jnp.maximum(err, 1e-9)
        new_a = a
        for j in range(1, i):
            new_a = new_a.at[..., j].set(a[..., j] + k * a[..., i - j])
        new_a = new_a.at[..., i].set(k)
        a = new_a
        err = err * (1 - k * k)
    return a


# ---------------------------------------------------------------------------
# Hilbert / analytic signal (reference ``models/utils.py:557-574``)
# ---------------------------------------------------------------------------

def hilbert(x: jax.Array, axis: int = -1) -> jax.Array:
    """FFT analytic signal; returns complex. Matches scipy/torch semantics."""
    n = x.shape[axis]
    xf = jnp.fft.fft(x, axis=axis)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1:n // 2] = 2
    else:
        h[0] = 1
        h[1:(n + 1) // 2] = 2
    shape = [1] * x.ndim
    shape[axis] = n
    return jnp.fft.ifft(xf * jnp.asarray(h).reshape(shape), axis=axis)


def minimum_phase_fir(log_mag: jax.Array) -> jax.Array:
    """Half-spectrum log-magnitude frames -> minimum-phase FIR kernels.

    Reference ``LTVMinimumPhaseFIRFilterPrecise.get_minimum_phase_fir``
    (``models/filters.py:203-214``): mirror the spectrum, Hilbert for the
    phase, ifft -> real kernel of length n_fft.
    """
    full = jnp.concatenate(
        [log_mag, jnp.flip(log_mag, -1)[..., 1:-1]], axis=-1)
    min_phase = -hilbert(full, axis=-1).imag
    fr = jnp.exp(full + 1j * min_phase)
    return jnp.fft.ifft(fr, axis=-1).real


def zero_phase_fir(log_mag: jax.Array) -> jax.Array:
    """Half-spectrum log-magnitude -> zero-phase (centered) FIR.

    Reference ``LTVZeroPhaseFIRFilterPrecise.get_zero_phase_fir``
    (``models/filters.py:294-300``): irfft then fftshift.
    """
    mag = jnp.exp(log_mag)
    fir = jnp.fft.irfft(mag, axis=-1)
    return jnp.fft.fftshift(fir, axes=-1)


# ---------------------------------------------------------------------------
# Radiation filter (reference ``models/utils.py:403-414``)
# ---------------------------------------------------------------------------

def get_radiation_time_filter(num_zeros: int = 16,
                              window_fn: Callable[[int], np.ndarray] = None
                              ) -> np.ndarray:
    t = np.arange(-num_zeros, num_zeros + 1)
    pi_t = t * np.pi
    tmp = np.cos(pi_t) - np.sinc(t)  # np.sinc(t) == sin(pi t)/(pi t)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = tmp / t
    out[num_zeros] = 0
    if window_fn is not None:
        out = out * window_fn(out.shape[0])
    return out


# ---------------------------------------------------------------------------
# Phase helpers
# ---------------------------------------------------------------------------

def smooth_phase_offset(phase_offset: jax.Array) -> jax.Array:
    """Unwrap phase-offset jumps into [-0.5, 0.5] increments
    (reference ``models/utils.py:547-554``)."""
    diffs = (jnp.diff(phase_offset, axis=1) + 0.5) % 1 - 0.5
    return jnp.cumsum(
        jnp.concatenate([phase_offset[:, :1], diffs], axis=1), axis=1)


def freq2cent(f0):
    return 1200 * np.log2(f0 / 440)


# ---------------------------------------------------------------------------
# Prefix sum without giant reduce_window
# ---------------------------------------------------------------------------

def fast_cumsum(x: jax.Array, axis: int = -1,
                block: int = 256) -> jax.Array:
    """Two-level blocked prefix sum along ``axis``.

    ``jnp.cumsum`` lowers to a reduce_window whose window spans the whole
    axis — on long audio axes (10^5-10^6 samples) that is pathological for
    the TPU compiler. This formulation is a lower-triangular matmul within
    blocks (MXU) plus a short cumsum over block totals.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if n <= 2 * block:
        out = jnp.cumsum(x, axis=-1)
        return jnp.moveaxis(out, -1, axis)
    k = -(-n // block)
    pad = k * block - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    blocks = xp.reshape(*x.shape[:-1], k, block)
    tri = jnp.tril(jnp.ones((block, block), x.dtype))
    within = jnp.einsum("...kb,cb->...kc", blocks, tri)
    totals = within[..., -1]
    offsets = jnp.cumsum(totals, axis=-1) - totals
    out = (within + offsets[..., None]).reshape(*x.shape[:-1], k * block)
    out = out[..., :n]
    return jnp.moveaxis(out, -1, axis)
