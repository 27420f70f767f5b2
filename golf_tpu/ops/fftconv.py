"""Long convolutions via overlap-save block FFT.

A single big rfft over a 10^5-10^6-sample signal embeds megabytes of
twiddle constants in the executable (2^20-point FFT ~ 8 MB); through the
remote-TPU relay the executable size shows up as per-dispatch cost.
Overlap-save processes the signal in fixed blocks, so one small FFT plan
is reused — same math, tiny executable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def fft_conv_full(x: jax.Array, k: jax.Array,
                  block: int = 8192) -> jax.Array:
    """Full linear convolution along the last axis via overlap-save.

    x: (..., T), k: (K,) -> (..., T + K - 1). Equivalent to
    ``np.convolve(x, k, 'full')`` per leading index.
    """
    taps = k.shape[-1]
    t = x.shape[-1]
    n_out = t + taps - 1
    if n_out <= block:
        nfft = 1 << (n_out - 1).bit_length()
        return jnp.fft.irfft(
            jnp.fft.rfft(x, nfft) * jnp.fft.rfft(k, nfft),
            nfft)[..., :n_out]

    nfft = 1 << (block - 1).bit_length()
    step = nfft - (taps - 1)
    n_blocks = -(-n_out // step)
    # x padded so frame f covers conv_full outputs [f*step, f*step+step);
    # framing is gather-free (ops/dsp.py::unfold): slices, not a gather
    # whose backward would scatter-add over F*nfft elements.
    from .dsp import unfold
    lead = x.shape[:-1]
    xp = jnp.pad(x, [(0, 0)] * (len(lead)) + [(taps - 1,
                                               n_blocks * step - t)])
    frames = unfold(xp, nfft, step)              # (..., F, nfft), exact

    kf = jnp.fft.rfft(k, nfft)
    seg = jnp.fft.irfft(jnp.fft.rfft(frames, nfft) * kf, nfft)
    out = seg[..., taps - 1:taps - 1 + step]
    out = out.reshape(*lead, n_blocks * step)
    return out[..., :n_out]
