"""Polyphase anti-aliased decimation (kazane.Decimate equivalent).

The oversampled glottal wavetable path integrates phase at k x sample rate
then decimates by k with a windowed-sinc lowpass (reference
``models/synth.py:207-211, 261-262``). On TPU this is a strided
``lax.conv_general_dilated`` — the MXU-friendly formulation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sinc_kernel(q: int, zeros: int = 56, roll_off: float = 0.945) -> np.ndarray:
    """Windowed-sinc lowpass for decimation by q (kazane/julius-style:
    Kaiser-windowed sinc at cutoff roll_off * (sr/2q))."""
    cutoff = roll_off * 0.5 / q
    half = int(zeros * q)
    t = np.arange(-half, half + 1, dtype=np.float64)
    # Kaiser beta for ~roll_off band (same default as julius: beta=14. approx)
    beta = 14.769656459379492
    win = np.kaiser(2 * half + 1, beta)
    k = 2 * cutoff * np.sinc(2 * cutoff * t) * win
    return (k / k.sum()).astype(np.float32)


def decimate(x: jax.Array, q: int, kernel: np.ndarray | None = None) -> jax.Array:
    """Anti-aliased decimation by integer factor q. x: (B, T) -> (B, ceil(T/q)).

    Matches kazane.Decimate semantics ('same'-padded lowpass then stride).
    Dispatches to the polyphase-FFT realization: the direct single-channel
    strided convolution takes ~500 s to compile on the TPU toolchain
    (measured), and convolving at the oversampled rate (decimate_fft)
    wastes a q-times-larger irfft on outputs the stride throws away
    (pow2 1.58 ms vs polyphase ~0 ms at T=576k/q=4 on v5e,
    tools/source_profile3.py). Custom kernels whose half-width is not a
    multiple of q (the polyphase decomposition's alignment requirement)
    fall back to the full-rate FFT path."""
    if kernel is not None and ((np.asarray(kernel).shape[0] - 1) // 2) % q:
        return decimate_fft(x, q, kernel)
    return decimate_poly_fft(x, q, kernel)


def decimate_direct(x: jax.Array, q: int,
                    kernel: np.ndarray | None = None) -> jax.Array:
    """Direct strided-conv realization (CPU/reference path)."""
    if kernel is None:
        kernel = sinc_kernel(q)
    k = jnp.asarray(kernel, x.dtype)
    half = (kernel.shape[0] - 1) // 2
    xp = jnp.pad(x, ((0, 0), (half, half)))[:, None, :]
    out = jax.lax.conv_general_dilated(
        xp, k[None, None, :], window_strides=(q,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]


def decimate_poly_fft(x: jax.Array, q: int,
                      kernel: np.ndarray | None = None) -> jax.Array:
    """Polyphase-FFT decimation, bit-compatible with ``decimate_fft``.

    Rather than convolving at the OVERSAMPLED rate (one rfft/irfft pair
    of length ~qT) this splits x into its q phases x_p[v] = x[qv+p] and
    convolves each with the matching kernel phase at the DECIMATED rate:
    q forward rffts of length ~T and ONE irfft of length ~T, i.e. about
    half the FFT work and a q-times smaller inverse transform. Exact
    because out[m] = conv_full[half + m q] = sum_p (x_p * k'_p)[m + Z]
    with k'_p[u] = k[qu - p] (zero outside [0, taps)), Z = half/q.
    """
    if kernel is None:
        kernel = sinc_kernel(q)
    kern = np.asarray(kernel, np.float32)
    taps = kern.shape[0]
    half = (taps - 1) // 2
    assert half % q == 0, (half, q)  # sinc_kernel guarantees half = zeros*q
    z = half // q
    t = x.shape[-1]
    out_len = -(-t // q)
    xp = jnp.pad(x, ((0, 0), (0, out_len * q - t)))
    xp = xp.reshape(*x.shape[:-1], out_len, q)          # [..., v, p]
    u = np.arange(2 * z + 1)
    kk = np.zeros((q, 2 * z + 1), np.float32)
    for p in range(q):
        idx = q * u - p
        valid = (idx >= 0) & (idx < taps)
        kk[p, valid] = kern[idx[valid]]
    from .fftsize import conv_fft_size
    nfft = conv_fft_size(out_len + 2 * z)
    xf = jnp.fft.rfft(jnp.swapaxes(xp, -1, -2), nfft)   # (B, q, F)
    kf = jnp.fft.rfft(jnp.asarray(kk, x.dtype), nfft)   # (q, F)
    conv = jnp.fft.irfft(jnp.sum(xf * kf, axis=-2), nfft)
    return conv[..., z:z + out_len]


def decimate_fft(x: jax.Array, q: int,
                 kernel: np.ndarray | None = None) -> jax.Array:
    """FFT overlap-free decimation: full convolution via rfft, then stride.

    Same math as ``decimate`` but avoids the degenerate single-channel
    direct convolution (compile-hostile on TPU); one big rfft/irfft pair
    instead.
    """
    if kernel is None:
        kernel = sinc_kernel(q)
    k = jnp.asarray(kernel, x.dtype)
    taps = kernel.shape[0]
    half = (taps - 1) // 2
    t = x.shape[-1]
    n = t + taps - 1
    nfft = 1 << (n - 1).bit_length()
    conv = jnp.fft.irfft(
        jnp.fft.rfft(x, nfft) * jnp.fft.rfft(k, nfft), nfft)
    # 'same' alignment: output m corresponds to full-conv index m + half
    out_len = -(-t // q)
    return conv[..., half:half + t:q][..., :out_len]
