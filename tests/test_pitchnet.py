"""Neural pitch estimator (the penn-equivalent path of scripts/wav2f0.py).

Reference behavior: penn's from_file → (pitch, periodicity) →
torch.where(periodicity > 0.065, pitch, 0) (reference
scripts/wav2f0.py:36-45). Here: golf_tpu.models.pitchnet + the shipped
in-image-trained weights.
"""

import os

import numpy as np
import pytest

from golf_tpu.models import pitchnet as pn
from golf_tpu.utils.pitchnet import ASSET, predict


def test_frame_and_decode_shapes():
    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).standard_normal(16000)
    frames, n = pn.frame_signal(x, 16000, hop_ms=5.0)
    assert frames.shape == (n, pn.FRAME)
    assert n == 201  # 1 s at 5 ms hop, inclusive endpoint
    model = pn.PitchNet()
    params = model.init(jax.random.key(0), jnp.zeros((2, pn.FRAME)))
    logits = model.apply(params, jnp.asarray(frames[:8]))
    assert logits.shape == (8, pn.N_BINS)
    f0, per = pn.decode(logits)
    assert f0.shape == (8,) and per.shape == (8,)
    assert np.all(np.asarray(per) >= 0) and np.all(np.asarray(per) <= 1)


def test_bin_roundtrip():
    f0 = np.array([65.0, 110.0, 440.0, 1000.0])
    centers = pn.bin_centers_hz()[pn.f0_to_bin(f0)]
    cents = 1200 * np.abs(np.log2(centers / f0))
    assert cents.max() <= pn.CENTS_PER_BIN / 2 + 1e-6


@pytest.mark.skipif(not os.path.exists(ASSET),
                    reason="shipped weights not present")
def test_trained_weights_track_pitch_and_gate_unvoiced():
    sr = 24000
    t = np.arange(int(sr * 1.0)) / sr
    rng = np.random.default_rng(1)
    for f0_true in (110.0, 220.0, 330.0):
        x = sum(np.sin(2 * np.pi * k * f0_true * t) / k
                for k in range(1, 9))
        x += 0.01 * rng.standard_normal(len(t))
        f0, per = predict(x.astype(np.float32), sr)
        mid = f0[20:-20]
        voiced = mid > 0
        assert voiced.mean() > 0.9, f"{f0_true}: voiced {voiced.mean()}"
        cents = 1200 * np.abs(np.log2(mid[voiced] / f0_true))
        assert np.median(cents) < 30, f"{f0_true}: {np.median(cents)}"
    # pure noise must gate to 0 nearly everywhere
    noise = rng.standard_normal(int(sr * 0.5)).astype(np.float32)
    f0, _ = predict(noise, sr)
    assert (f0 == 0).mean() > 0.9
