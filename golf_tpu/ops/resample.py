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
    Dispatches to the FFT realization: the direct single-channel strided
    convolution takes ~500 s to compile on the TPU toolchain (measured)
    while the rfft/irfft pair compiles in seconds and runs just as fast.
    """
    return decimate_fft(x, q, kernel)


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
