"""STFT / spectrogram / mel ops with torch-compatible semantics.

The losses and encoders in the reference all go through
``torchaudio.transforms.Spectrogram`` (center=True, reflect pad, win_length
= n_fft unless given, normalized=False). Numerical parity of the MSS loss
depends on matching framing and padding exactly, so those semantics are
re-implemented here on top of ``jnp.fft`` (XLA's TPU FFT).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dsp import get_window_fn


def frame_signal(x: jax.Array, frame_length: int, hop: int,
                 center: bool = True, pad_mode: str = "reflect") -> jax.Array:
    """(..., T) -> (..., F, frame_length), torch.stft framing.

    GATHER-FREE: fancy-indexing the frame matrix lowers to XLA's serial
    gather on TPU (and its backward to scatter-add) — measured as the
    bulk of the 38 ms MSS-loss forward at the training shape. Instead,
    blockify x at the hop and build each frame from q = n//hop shifted
    block views plus a remainder column slice: frame i, position
    k*hop + t  is  block[i+k, t], so
        frames = concat([blk[k:k+F] for k in 0..q-1] + [blk[q:q+F,:rem]])
    — pure slices/concat (transpose: pad+add), identical elements.
    """
    if center:
        pad = frame_length // 2
        cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, cfg, mode=pad_mode)
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    q, rem = divmod(frame_length, hop)
    lead = x.shape[:-1]
    rows = n_frames + q
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, rows * hop - t)])
    blk = x.reshape(*lead, rows, hop)
    parts = [blk[..., k:k + n_frames, :] for k in range(q)]
    if rem:
        parts.append(blk[..., q:q + n_frames, :rem])
    return jnp.concatenate(parts, axis=-1)


def stft(x: jax.Array, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, window: str = "hann",
         center: bool = True, onesided: bool = True,
         pad_mode: str = "reflect") -> jax.Array:
    """torch.stft-compatible. Returns complex (..., n_bins, n_frames)."""
    win_length = win_length or n_fft
    w = np.zeros(n_fft)
    ofs = (n_fft - win_length) // 2
    w[ofs:ofs + win_length] = get_window_fn(window)(win_length)
    frames = frame_signal(x, n_fft, hop_length, center, pad_mode)
    frames = frames * jnp.asarray(w, x.dtype)
    if onesided:
        # the reference MSS criterion's PRIME n_fft (509/1021/2053) are
        # handled natively and FAST by XLA TPU FFT (on-chip probe
        # docs/results_r4/bluestein_probe.json: 509 -> 0.36 ms vs 3.46 ms
        # for a hand-rolled chirp-z with fast conv sizes — the
        # alternative lost 4-10x at every size and was deleted)
        spec = jnp.fft.rfft(frames, axis=-1)
    else:
        spec = jnp.fft.fft(frames, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def istft(spec: jax.Array, n_fft: int, hop_length: int,
          win_length: Optional[int] = None, window: str = "hann",
          center: bool = True, onesided: bool = True,
          length: Optional[int] = None) -> jax.Array:
    """Inverse STFT with window-square overlap-add normalization
    (torch.istft semantics). spec: (..., n_bins, n_frames)."""
    win_length = win_length or n_fft
    w = np.zeros(n_fft)
    ofs = (n_fft - win_length) // 2
    w[ofs:ofs + win_length] = get_window_fn(window)(win_length)
    wj = jnp.asarray(w, jnp.float32)

    frames_spec = jnp.swapaxes(spec, -1, -2)  # (..., F, n_bins)
    if onesided:
        frames = jnp.fft.irfft(frames_spec, n=n_fft, axis=-1)
    else:
        frames = jnp.fft.ifft(frames_spec, axis=-1).real
    frames = frames * wj

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)
    lead = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    # Strip-blocked OLA (dynamic-update-slice adds, no scatter: a
    # flattened .at[idx].add lowers to XLA scatter on TPU and its
    # backward to gather — both serial).
    q = -(-n_fft // hop_length)
    fr = jnp.pad(flat, ((0, 0), (0, 0), (0, q * hop_length - n_fft)))
    fr = fr.reshape(-1, n_frames, q, hop_length)
    buf = jnp.zeros((fr.shape[0], n_frames + q, hop_length), fr.dtype)
    for j in range(q):
        buf = buf.at[:, j:j + n_frames].add(fr[:, :, j])
    y = buf.reshape(fr.shape[0], -1)[:, :out_len]

    # window-square normalization is data-independent: host numpy
    wsq = np.zeros(out_len)
    for i in range(n_frames):
        wsq[i * hop_length:i * hop_length + n_fft] += w * w
    y = y / jnp.asarray(np.maximum(wsq, 1e-11), jnp.float32)
    y = y.reshape(lead + (out_len,))
    if center:
        y = y[..., n_fft // 2: out_len - n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y


def spectrogram(x: jax.Array, n_fft: int, hop_length: int,
                win_length: Optional[int] = None, window: str = "hann",
                power: Optional[float] = 2.0, center: bool = True,
                onesided: bool = True, pad_mode: str = "reflect") -> jax.Array:
    """torchaudio.transforms.Spectrogram equivalent.

    power=None returns complex; power=1 magnitude; power=2 power-spectrum.
    """
    s = stft(x, n_fft, hop_length, win_length, window, center, onesided,
             pad_mode)
    if power is None:
        return s
    mag = jnp.abs(s)
    if power == 1.0:
        return mag
    return mag ** power


def hz_to_mel(f, mel_scale: str = "htk"):
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def mel_to_hz(m, mel_scale: str = "htk"):
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def melscale_fbanks(n_freqs: int, f_min: float, f_max: float, n_mels: int,
                    sample_rate: int, norm: Optional[str] = None,
                    mel_scale: str = "htk") -> np.ndarray:
    """torchaudio.functional.melscale_fbanks equivalent: (n_freqs, n_mels)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = hz_to_mel(f_min, mel_scale)
    m_max = hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def melspectrogram(x: jax.Array, sample_rate: int, n_fft: int,
                   hop_length: int, n_mels: int,
                   win_length: Optional[int] = None,
                   window: str = "hann", f_min: float = 0.0,
                   f_max: Optional[float] = None, power: float = 2.0,
                   center: bool = True, mel_scale: str = "htk") -> jax.Array:
    """torchaudio MelSpectrogram equivalent: (..., n_mels, F)."""
    f_max = f_max or sample_rate / 2
    spec = spectrogram(x, n_fft, hop_length, win_length, window, power,
                       center)
    fb = jnp.asarray(melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels,
                                     sample_rate, mel_scale=mel_scale))
    return jnp.einsum("...ft,fm->...mt", spec, fb)
