"""Mel-cepstral analysis/synthesis stack (diffsptk-equivalent, in JAX).

Covers the reference's diffsptk surface (``models/filters.py:9-16``,
``ltng/ae.py:212-219``, ``ltng/lpcnet.py:86-100``):

* ``freqt``: Oppenheim frequency transform (all-pass warping) of cepstra.
* ``mcep``: mel-cepstral analysis of amplitude-spectrum frames (the
  n_iter=0 SPTK estimate: warped real cepstrum). Used for the MCD metric —
  both signals go through the same transform so the metric is faithful.
* ``mc2sp``: mel-cepstrum -> log-magnitude spectrum.
* ``mlsa_log_spectrum`` + STFT filtering: the freq-domain MLSA mode.
* PQMF analysis filterbank (cosine-modulated, Kaiser prototype).
* LPC <-> reflection <-> LAR conversions (LPCNet trainer).

Everything is batched over leading dims and jit-friendly; design-time
constants (warping matrices, prototypes) are numpy.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import kaiser_beta, kaiserord, firwin

from .dsp import hilbert


# ---------------------------------------------------------------------------
# Frequency transform (freqt): c (order M1) -> warped c (order M2)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _freqt_matrix(in_order: int, out_order: int, alpha: float) -> np.ndarray:
    """Linear map implementing the Oppenheim recursion; (M1+1, M2+1)."""
    m1, m2 = in_order + 1, out_order + 1
    a = np.zeros((m1, m2))
    # run the recursion on unit vectors
    for i in range(m1):
        c = np.zeros(m1)
        c[i] = 1.0
        d = np.zeros(m2)
        for n in range(m1 - 1, -1, -1):
            prev = d.copy()
            d[0] = c[n] + alpha * prev[0]
            if m2 > 1:
                d[1] = (1 - alpha * alpha) * prev[0] + alpha * prev[1]
            for m in range(2, m2):
                d[m] = prev[m - 1] + alpha * (prev[m] - d[m - 1])
        a[i] = d
    return a


def freqt(c: jax.Array, out_order: int, alpha: float) -> jax.Array:
    """Frequency-transform cepstra along the last axis."""
    m1 = c.shape[-1] - 1
    mat = jnp.asarray(_freqt_matrix(m1, out_order, float(alpha)),
                      dtype=c.dtype)
    return c @ mat


# ---------------------------------------------------------------------------
# Mel-cepstral analysis
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _warped_cos_basis(n_bins: int, cep_order: int,
                      alpha: float) -> np.ndarray:
    """phi_m(w) = cos(m * beta(w)) on the half-spectrum grid, where
    beta is the first-order all-pass warped frequency. The mel
    log-spectrum model is LINEAR in the mel-cepstrum: S(w) = sum_m c_m
    phi_m(w). Returns (n_bins, cep_order+1)."""
    w = np.linspace(0.0, np.pi, n_bins)
    beta = w + 2.0 * np.arctan2(alpha * np.sin(w),
                                1.0 - alpha * np.cos(w))
    m = np.arange(cep_order + 1)
    return np.cos(beta[:, None] * m[None, :])


def mcep(amp_spec: jax.Array, cep_order: int, alpha: float = 0.0,
         eps: float = 1e-8, n_iter: int = 0) -> jax.Array:
    """Amplitude-spectrum frames (..., n_fft//2+1) -> mel-cepstrum
    (..., cep_order+1).

    n_iter=0: the SPTK initial estimate (warped real cepstrum).
    n_iter>0: Newton iterations on the mel log-spectral-approximation
    criterion E = mean[exp(R) - R - 1], R = 2(log|X| - S(c)) — the
    criterion SPTK's mcep minimizes — so converged values are comparable
    to diffsptk/SPTK's iterative solution (``ltng/ae.py:214-217`` uses
    diffsptk MelCepstralAnalysis for the MCD metric).
    """
    n_bins = amp_spec.shape[-1]
    n_fft = 2 * (n_bins - 1)
    log_mag = jnp.log(jnp.maximum(amp_spec, eps))
    full = jnp.concatenate([log_mag, jnp.flip(log_mag, -1)[..., 1:-1]],
                           axis=-1)
    c = jnp.fft.ifft(full, axis=-1).real  # real cepstrum, length n_fft
    half = n_fft // 2
    # fold to one-sided cosine-series coefficients:
    # log|X(w)| = c[0] + 2*sum_{1<=m<half} c[m] cos(wm) + c[half] cos(w*half)
    c0 = c[..., :half + 1]
    c0 = c0.at[..., 1:half].multiply(2.0)
    mc = freqt(c0, cep_order, alpha)
    if n_iter <= 0:
        return mc

    phi = jnp.asarray(_warped_cos_basis(n_bins, cep_order, float(alpha)),
                      log_mag.dtype)                      # (bins, M+1)
    # trapezoid quadrature weights over the half spectrum
    qw = jnp.ones(n_bins, log_mag.dtype).at[0].set(0.5).at[-1].set(0.5)
    for _ in range(n_iter):
        s = jnp.einsum("...m,bm->...b", mc, phi)
        r = jnp.clip(2.0 * (log_mag - s), -30.0, 30.0)
        er = jnp.exp(r)
        grad = -2.0 * jnp.einsum("...b,b,bm->...m", er - 1.0, qw, phi)
        hess = 4.0 * jnp.einsum("...b,b,bm,bn->...mn", er, qw, phi, phi)
        # Levenberg damping keeps early steps stable far from optimum
        hess = hess + 1e-4 * jnp.trace(
            hess, axis1=-2, axis2=-1)[..., None, None] \
            * jnp.eye(cep_order + 1, dtype=hess.dtype)
        step = jnp.linalg.solve(hess, grad[..., None])[..., 0]
        mc = mc - step
    return mc


def mc2sp_log(mc: jax.Array, n_fft: int, alpha: float = 0.0,
              lin_order: Optional[int] = None) -> jax.Array:
    """Mel-cepstrum -> log-magnitude half spectrum (..., n_fft//2+1)."""
    if lin_order is None:
        lin_order = n_fft // 2
    c_lin = freqt(mc, lin_order, -alpha)
    m = jnp.arange(c_lin.shape[-1])
    w = jnp.arange(n_fft // 2 + 1) * (2 * jnp.pi / n_fft)
    cos = jnp.cos(w[:, None] * m[None, :])  # (bins, order+1)
    return jnp.einsum("...m,bm->...b", c_lin, cos)


def minimum_phase_response(log_mag_half: jax.Array) -> jax.Array:
    """Half-spectrum log-magnitude -> complex min-phase frequency response
    (one-sided)."""
    n_bins = log_mag_half.shape[-1]
    full = jnp.concatenate(
        [log_mag_half, jnp.flip(log_mag_half, -1)[..., 1:-1]], axis=-1)
    min_phase = -hilbert(full, axis=-1).imag
    h = jnp.exp(full + 1j * min_phase)
    return h[..., :n_bins]


# ---------------------------------------------------------------------------
# PQMF (cosine-modulated filterbank)
# ---------------------------------------------------------------------------

def pqmf_filters(n_bands: int, filter_order: int,
                 alpha: float = 100.0) -> np.ndarray:
    """Pseudo-QMF analysis filters (n_bands, filter_order+1).

    Kaiser-windowed prototype at cutoff pi/(2*n_bands), cosine-modulated
    (standard PQMF design; diffsptk-compatible shape/convention)."""
    taps = filter_order
    # prototype lowpass
    beta = kaiser_beta(alpha) if alpha > 0 else 0.0
    cutoff = 0.5 / n_bands  # normalized (Nyquist=1) -> firwin convention
    proto = firwin(taps + 1, cutoff, window=("kaiser", beta))
    k = np.arange(taps + 1)
    filters = np.zeros((n_bands, taps + 1))
    for b in range(n_bands):
        phase = (-1) ** b * np.pi / 4
        filters[b] = 2 * proto * np.cos(
            (2 * b + 1) * np.pi / (2 * n_bands) * (k - taps / 2) + phase)
    return filters.astype(np.float32)


def pqmf_analysis(x: jax.Array, filters: jax.Array) -> jax.Array:
    """Non-decimated analysis: x (B, T) -> (B, n_bands, T) ("same" pad)."""
    taps = filters.shape[-1]
    pad_l = (taps - 1) // 2
    pad_r = taps - 1 - pad_l
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r)))[:, None, :]
    out = jax.lax.conv_general_dilated(
        xp, jnp.flip(filters, -1)[:, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out


# ---------------------------------------------------------------------------
# LPC <-> RC <-> LAR (LPCNet chain)
# ---------------------------------------------------------------------------

def lpc2rc(a: jax.Array) -> jax.Array:
    """Step-down recursion: a1..ap -> reflection coefficients k1..kp."""
    p = a.shape[-1]
    cur = a
    ks = []
    for n in range(p, 0, -1):
        k = cur[..., n - 1:n]
        ks.append(k)
        if n > 1:
            denom = 1 - k * k
            prev = (cur[..., :n - 1] - k * jnp.flip(cur[..., :n - 1], -1)) \
                / jnp.maximum(denom, 1e-9)
            cur = prev
    return jnp.concatenate(ks[::-1], axis=-1)


def rc2lar(k: jax.Array, clip: float = 0.999) -> jax.Array:
    k = jnp.clip(k, -clip, clip)
    return jnp.log((1 + k) / (1 - k))


def lar2rc(g: jax.Array) -> jax.Array:
    return jnp.tanh(g / 2)


def lpc_from_frames(frames: jax.Array, order: int,
                    window: Optional[jax.Array] = None) -> jax.Array:
    """Frames (..., L) -> [gain, a1..ap] like diffsptk LPC: window,
    autocorrelate, Levinson."""
    from .dsp import levinson
    if window is not None:
        frames = frames * window
    l = frames.shape[-1]
    spec = jnp.fft.rfft(frames, 2 * l, axis=-1)
    r = jnp.fft.irfft(jnp.abs(spec) ** 2, 2 * l, axis=-1)[..., :order + 1]
    r = r / l
    a = levinson(r, order)
    # prediction error -> gain
    err = r[..., 0] + jnp.sum(a[..., 1:] * r[..., 1:], axis=-1)
    gain = jnp.sqrt(jnp.maximum(err, 1e-12))
    return jnp.concatenate([gain[..., None], a[..., 1:]], axis=-1)
