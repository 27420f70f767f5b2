"""WORLD-lite: host-side analysis/synthesis vocoder baseline.

Replaces the reference's pyworld (C++ WORLD) dependency surface
(``ltng/world_ae.py:36-41``, ``models/utils.py:596-602``): f0 estimation
(``dio``-equivalent), spectral envelope (CheapTrick-style), band
aperiodicity (D4C-lite), and synthesis. Pure numpy reference
implementation; a C++ implementation with the same C API lives in
``native/`` and is preferred when built (see ``golf_tpu.utils.native``).

These run on the host (data prep + non-trainable baseline), not the TPU —
same placement as the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# f0 estimation (YIN-based dio equivalent)
# ---------------------------------------------------------------------------

def dio(x: np.ndarray, fs: int, f0_floor: float = 65.0,
        f0_ceil: float = 1047.0, frame_period: float = 5.0,
        channels_in_octave: float = 2.0,
        threshold: float = 0.15) -> Tuple[np.ndarray, np.ndarray]:
    """f0 track via YIN (CMND) with the dio call signature used by the
    reference (``models/utils.py:596-602``). Returns (f0, time_axis)."""
    x = np.asarray(x, np.float64)
    hop = int(fs * frame_period / 1000)
    tau_min = max(2, int(fs / f0_ceil))
    tau_max = int(fs / f0_floor)
    win = 2 * tau_max
    n_frames = len(x) // hop + 1
    f0 = np.zeros(n_frames)
    xp = np.pad(x, (0, win + tau_max + 1))
    for i in range(n_frames):
        seg = xp[i * hop: i * hop + win]
        f0[i] = _yin_pitch(seg, fs, tau_min, tau_max, threshold)
    t = np.arange(n_frames) * frame_period / 1000
    return f0, t


def _yin_pitch(seg: np.ndarray, fs: int, tau_min: int, tau_max: int,
               threshold: float) -> float:
    w = len(seg) // 2
    n = len(seg)
    # YIN cross term r(tau) = sum_{i<w} seg[i] * seg[i+tau], via FFT
    fa = np.fft.rfft(seg[:w], 2 * n)
    fb = np.fft.rfft(seg, 2 * n)
    cc = np.fft.irfft(np.conj(fa) * fb)[:w + 1]
    cum = np.cumsum(seg ** 2)
    pow0 = cum[w - 1]
    pow_tau = cum[w - 1 + np.arange(w + 1)] - np.concatenate(
        [[0], cum[np.arange(w)]])
    d = pow0 + pow_tau - 2 * cc
    d = np.maximum(d, 0)
    # cumulative mean normalized difference
    denom = np.cumsum(d[1:]) / np.arange(1, w + 1)
    cmnd = np.ones(w + 1)
    cmnd[1:] = d[1:] / np.maximum(denom, 1e-12)
    tau_max = min(tau_max, w - 1)
    below = np.where(cmnd[tau_min:tau_max] < threshold)[0]
    if below.size:
        tau = tau_min + below[0]
        # walk to local minimum
        while tau + 1 < tau_max and cmnd[tau + 1] < cmnd[tau]:
            tau += 1
    else:
        tau = tau_min + int(np.argmin(cmnd[tau_min:tau_max]))
        if cmnd[tau] > 0.5:
            return 0.0
    # parabolic interpolation
    if 1 <= tau < w - 1:
        a, b, c = cmnd[tau - 1], cmnd[tau], cmnd[tau + 1]
        denom2 = a - 2 * b + c
        if abs(denom2) > 1e-12:
            tau = tau + 0.5 * (a - c) / denom2
    return fs / tau if tau > 0 else 0.0


# ---------------------------------------------------------------------------
# Spectral envelope (CheapTrick-style)
# ---------------------------------------------------------------------------

def cheaptrick(x: np.ndarray, f0: np.ndarray, t: np.ndarray, fs: int,
               fft_size: Optional[int] = None,
               default_f0: float = 500.0) -> np.ndarray:
    """f0-adaptive windowed power spectrum + spectral smoothing + liftering.
    Returns (n_frames, fft_size//2+1) power envelope."""
    x = np.asarray(x, np.float64)
    if fft_size is None:
        fft_size = 2 ** math.ceil(math.log2(3 * fs / 71.0 + 1))
    half = fft_size // 2
    n_frames = len(f0)
    sp = np.zeros((n_frames, half + 1))
    freq = np.arange(half + 1) * fs / fft_size
    q1 = -0.15
    for i in range(n_frames):
        cf0 = f0[i] if f0[i] > 0 else default_f0
        center = int(t[i] * fs)
        win_len = min(int(3 * fs / cf0) // 2 * 2 + 1, fft_size)
        idx = center + np.arange(win_len) - win_len // 2
        idx = np.clip(idx, 0, len(x) - 1)
        seg = x[idx] * np.hanning(win_len)
        power = np.abs(np.fft.rfft(seg, fft_size)) ** 2
        power += 1e-12
        # rectangular smoothing of width 2/3 f0
        width = max(1, int(round((2 * cf0 / 3) / (fs / fft_size))))
        kernel = np.ones(2 * width + 1) / (2 * width + 1)
        smoothed = np.convolve(power, kernel, mode="same")
        # log-domain liftering
        log_sp = np.log(smoothed)
        cep = np.fft.irfft(np.concatenate(
            [log_sp, log_sp[-2:0:-1]]))[:half + 1]
        quef = np.arange(half + 1) / fs
        lifter = np.sinc(cf0 * quef)
        lifter_c = (1 + 2 * q1) - 2 * q1 * np.cos(
            2 * np.pi * quef * cf0)
        cep = cep * lifter * lifter_c
        cep_full = np.concatenate([cep, cep[-2:0:-1]])
        sp[i] = np.exp(np.fft.rfft(cep_full).real[:half + 1])
    return sp


# ---------------------------------------------------------------------------
# Aperiodicity (D4C-lite)
# ---------------------------------------------------------------------------

def d4c(x: np.ndarray, f0: np.ndarray, t: np.ndarray, fs: int,
        fft_size: Optional[int] = None) -> np.ndarray:
    """Coarse band aperiodicity: 1 - normalized autocorrelation at the
    pitch period, shaped over frequency. Returns (n_frames, bins)."""
    x = np.asarray(x, np.float64)
    if fft_size is None:
        fft_size = 2 ** math.ceil(math.log2(3 * fs / 71.0 + 1))
    half = fft_size // 2
    n_frames = len(f0)
    ap = np.ones((n_frames, half + 1)) * 0.999
    freq = np.arange(half + 1) * fs / fft_size
    for i in range(n_frames):
        if f0[i] <= 0:
            continue
        period = int(fs / f0[i])
        center = int(t[i] * fs)
        win = 3 * period
        idx0 = max(0, center - win)
        seg = x[idx0: center + win]
        if len(seg) < 2 * period + 2:
            continue
        a = seg[:-period]
        b = seg[period:]
        denom = np.sqrt(np.sum(a * a) * np.sum(b * b)) + 1e-12
        r = np.sum(a * b) / denom
        base_ap = math.sqrt(max(1e-6, 1 - max(r, 0.0) ** 2))
        # aperiodicity grows toward high frequencies (WORLD-like tilt)
        tilt = np.clip(
            base_ap + (1 - base_ap) * (freq / (fs / 2)) ** 2, 1e-3, 0.999)
        ap[i] = tilt
    return ap


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------

def synthesize(f0: np.ndarray, sp: np.ndarray, ap: np.ndarray, fs: int,
               frame_period: float = 5.0, seed: int = 0) -> np.ndarray:
    """Pulse+noise excitation shaped by sqrt(sp) with per-bin periodicity
    weighting — frame-OLA realization of WORLD synthesis."""
    rng = np.random.default_rng(seed)
    hop = int(fs * frame_period / 1000)
    n_frames = len(f0)
    fft_size = 2 * (sp.shape[1] - 1)
    out_len = n_frames * hop
    y = np.zeros(out_len + 2 * fft_size)
    wsum = np.zeros_like(y)
    win = np.hanning(fft_size)
    phase_acc = 0.0
    for i in range(n_frames):
        cf0 = f0[i]
        env = np.sqrt(np.maximum(sp[i], 1e-12))
        apw = np.clip(ap[i], 1e-3, 0.999)
        bins = sp.shape[1]
        noise_spec = (rng.standard_normal(bins)
                      + 1j * rng.standard_normal(bins)) / math.sqrt(2)
        if cf0 > 0:
            freq = np.arange(bins) * fs / fft_size
            nh = int((fs / 2) / cf0)
            harm_spec = np.zeros(bins, complex)
            if nh > 0:
                hfreq = (np.arange(1, nh + 1)) * cf0
                hbin = np.round(hfreq / (fs / fft_size)).astype(int)
                hbin = hbin[hbin < bins]
                phases = 2 * np.pi * phase_acc * np.arange(1, len(hbin) + 1)
                harm_spec[hbin] = np.exp(1j * phases) * math.sqrt(
                    fft_size / max(1, nh)) * 0.5
            spec = env * (harm_spec * np.sqrt(1 - apw ** 2)
                          + noise_spec * apw)
            phase_acc += cf0 * hop / fs
        else:
            spec = env * noise_spec
        frame = np.fft.irfft(spec)
        frame = np.fft.fftshift(frame) * win
        start = i * hop
        y[start:start + fft_size] += frame
        wsum[start:start + fft_size] += win ** 2
    y = y[fft_size // 2: fft_size // 2 + out_len]
    wsum = wsum[fft_size // 2: fft_size // 2 + out_len]
    return (y / np.maximum(wsum, 1e-6)).astype(np.float64)


def get_f0(x: np.ndarray, fs: int, f0_floor: float = 65.0,
           f0_ceil: float = 1047.0, frame_period: float = 5.0,
           channels_in_octave: float = 2.0):
    """pyworld-``get_f0`` partial equivalent (``models/utils.py:596-602``)."""
    return dio(x, fs, f0_floor=f0_floor, f0_ceil=f0_ceil,
               frame_period=frame_period,
               channels_in_octave=channels_in_octave)
