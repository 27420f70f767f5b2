"""Behavioral tests for the native P.862 implementation
(native/pesq862.cpp via golf_tpu.utils.pesq862).

Without the ITU reference binary no bit-exactness oracle exists in this
image, so these tests pin the perceptual-model *behavior*: perfect score
for identity, monotonic degradation with additive noise, robustness to
level scaling and small constant delays (the alignment stage), and a
penalty for nonlinear (quantization) distortion.
"""

import numpy as np
import pytest

from golf_tpu.utils import pesq862

pytestmark = pytest.mark.skipif(
    not pesq862.available(), reason="libpesq862.so not built")

FS = 16000


def _speech_like(seconds=3.0, seed=0):
    t = np.arange(int(FS * seconds)) / FS
    env = (np.sin(2 * np.pi * 1.3 * t) ** 2) * \
        (np.sin(2 * np.pi * 0.31 * t) > -0.2)
    x = env * sum(np.sin(2 * np.pi * 180 * k * t + 0.1 * k * k) / k
                  for k in range(1, 40))
    return (x * 0.1).astype(np.float32)


def test_identity_is_max():
    x = _speech_like()
    assert pesq862.pesq(x, x, FS, "wb") > 4.5


def test_noise_monotonic():
    x = _speech_like()
    rng = np.random.default_rng(0)
    scores = []
    for snr in (40, 30, 20, 10, 0):
        noise = rng.standard_normal(len(x)) * np.sqrt(
            (x ** 2).mean() / 10 ** (snr / 10))
        scores.append(pesq862.pesq(x, (x + noise).astype(np.float32),
                                   FS, "wb"))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.0          # 40 dB SNR barely audible
    assert scores[-1] < 1.6         # 0 dB SNR is bad


def test_level_invariance():
    x = _speech_like()
    s_half = pesq862.pesq(x, (0.5 * x).astype(np.float32), FS, "wb")
    s_double = pesq862.pesq(x, (2.0 * x).astype(np.float32), FS, "wb")
    assert s_half > 4.5 and s_double > 4.5


def test_delay_alignment():
    x = _speech_like()
    delayed = np.roll(x, 160).astype(np.float32)   # 10 ms
    assert pesq862.pesq(x, delayed, FS, "wb") > 4.2


def test_quantization_penalized():
    x = _speech_like()
    q = (np.round(x * 32) / 32).astype(np.float32)
    s = pesq862.pesq(x, q, FS, "wb")
    assert 1.5 < s < 4.4


def test_mnru_rank_tracks_anchors():
    """MNRU (P.810 modulated noise) ladder is perfectly rank-ordered —
    the calibration battery's quantitative core (docs/PESQ862.md;
    tools/pesq_battery.py for the full battery + gap analysis)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from pesq_battery import mnru, spearman, speech_like
    qs = [5, 15, 25, 35, 45]
    x = speech_like(seconds=3.0, seed=0)
    scores = [pesq862.pesq(x, mnru(x, q), FS, "wb") for q in qs]
    assert spearman(scores, qs) >= 0.9, scores


def test_narrowband_mode_runs():
    rng = np.random.default_rng(1)
    t = np.arange(FS // 2 * 3) / (FS // 2)
    x = (np.sin(2 * np.pi * 200 * t) *
         (np.sin(2 * np.pi * t) ** 2) * 0.1).astype(np.float32)
    noise = rng.standard_normal(len(x)).astype(np.float32) * 0.01
    s = pesq862.pesq(x, x + noise, 8000, "nb")
    assert 1.0 <= s <= 4.6
