"""FCNF0-style neural pitch estimator (the `penn` row of SURVEY §2.4).

The reference's ``scripts/wav2f0.py`` offers a neural pitch method via
the external ``penn`` package (FCNF0++, pretrained): frames → pitch-bin
logits → pitch + periodicity, with unvoiced gating at
``periodicity > 0.065``. No pretrained weights can enter this image
(zero egress), so instead of a dead import we ship a small JAX/flax
pitch net with the same interface and decoding rules, plus a trainer
(``tools/train_pitchnet.py``) that fits it on synthetic harmonic
signals with known ground truth; the trained weights live in
``golf_tpu/assets/``.

Design (TPU-first): the whole utterance is framed once and every frame
goes through a conv pyramid in a single batched dispatch — no Python
per-frame loop. Frames are 1024 samples at a 16 kHz analysis rate
(64 ms — ≥4 periods at the 65 Hz floor), hop 5 ms like every other f0
path in the framework.

Decoding matches penn's conventions: pitch = local expected value of
cents over a ±4-bin window around the argmax; periodicity = the max
softmax probability; unvoiced frames are trained toward the uniform
distribution so their max-prob is low and the 0.065 gate fires.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ANALYSIS_SR = 16000
FRAME = 1024
CENTS_PER_BIN = 10.0
FMIN = 65.0
FMAX = 1047.0
N_BINS = int(math.ceil(1200.0 * math.log2(FMAX / FMIN) / CENTS_PER_BIN)) + 1


def bin_centers_hz() -> np.ndarray:
    cents = np.arange(N_BINS) * CENTS_PER_BIN
    return FMIN * 2.0 ** (cents / 1200.0)


def f0_to_bin(f0: np.ndarray) -> np.ndarray:
    cents = 1200.0 * np.log2(np.maximum(f0, 1e-6) / FMIN)
    return np.clip(np.round(cents / CENTS_PER_BIN), 0, N_BINS - 1).astype(
        np.int32)


class PitchNet(nn.Module):
    """Strided conv pyramid: (B, 1024) frame → (B, N_BINS) logits."""

    channels: Tuple[int, ...] = (32, 64, 128, 256, 256)
    kernels: Tuple[int, ...] = (32, 16, 8, 8, 4)
    strides: Tuple[int, ...] = (4, 4, 4, 4, 4)

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        # per-frame normalization: remove DC, unit RMS
        x = frames - frames.mean(-1, keepdims=True)
        x = x / (jnp.sqrt((x * x).mean(-1, keepdims=True)) + 1e-6)
        h = x[..., None]
        for ch, k, s in zip(self.channels, self.kernels, self.strides):
            h = nn.Conv(ch, (k,), strides=(s,), padding=k // 2)(h)
            h = nn.LayerNorm()(h)
            h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(N_BINS)(h)


def frame_signal(x: np.ndarray, sr: int, hop_ms: float = 5.0
                 ) -> Tuple[np.ndarray, int]:
    """Resample to the analysis rate and cut centered frames.

    Returns (frames (N, FRAME), n_frames). Frame i is centered at
    i * hop_ms on the ORIGINAL clock (one row per hop over the whole
    file, matching the .pv convention of the other f0 methods).
    """
    if sr != ANALYSIS_SR:
        from ..utils.native import resample
        x = resample(np.asarray(x, np.float64), sr, ANALYSIS_SR)
        dur = len(x) / ANALYSIS_SR
    else:
        dur = len(x) / sr
    hop = int(round(ANALYSIS_SR * hop_ms / 1000.0))
    n_frames = int(dur * 1000.0 / hop_ms) + 1
    pad = FRAME // 2
    xp = np.pad(x.astype(np.float32), (pad, pad + FRAME))
    idx = np.arange(n_frames)[:, None] * hop + np.arange(FRAME)[None, :]
    return xp[idx], n_frames


def decode(logits: jnp.ndarray, gate: float = 0.065
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Logits → (f0_hz, periodicity); f0 gated to 0 where unvoiced.

    Local expected value of cents over ±4 bins around the argmax
    (penn's decoder), periodicity = max softmax probability.
    """
    probs = jax.nn.softmax(logits, -1)
    periodicity = probs.max(-1)
    center = jnp.argmax(probs, -1)
    offs = jnp.arange(-4, 5)
    idx = jnp.clip(center[:, None] + offs[None, :], 0, N_BINS - 1)
    w = jnp.take_along_axis(probs, idx, axis=-1)
    cents = (idx.astype(jnp.float32) * CENTS_PER_BIN * w).sum(-1) / (
        w.sum(-1) + 1e-9)
    f0 = FMIN * 2.0 ** (cents / 1200.0)
    return jnp.where(periodicity > gate, f0, 0.0), periodicity
