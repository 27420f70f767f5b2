"""Golden parity vs torch (CPU) for the semantics-critical ops.

The reference is a torch codebase; these tests pin the JAX
implementations to the exact torch behaviors the reference relies on:
stft framing/padding, grid_sample wavetable lookup, interpolate-based
hop upsampling.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from golf_tpu.core.sig import Sig, linear_upsample  # noqa: E402
from golf_tpu.ops import stft as stft_ops  # noqa: E402


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    n_fft, hop = 512, 128
    win = torch.hann_window(n_fft)
    ref = torch.stft(torch.from_numpy(x), n_fft, hop, window=win,
                     center=True, pad_mode="reflect",
                     return_complex=True).numpy()
    mine = np.asarray(stft_ops.stft(jnp.asarray(x), n_fft, hop,
                                    window="hann", center=True))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(np.abs(mine), np.abs(ref), atol=2e-3)
    np.testing.assert_allclose(mine.real, ref.real, atol=2e-3)


def test_spectrogram_power_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2048)).astype(np.float32)
    n_fft, hop = 256, 64
    win = torch.hann_window(n_fft)
    ref = torch.stft(torch.from_numpy(x), n_fft, hop, window=win,
                     center=True, pad_mode="reflect",
                     return_complex=True).abs().pow(2).numpy()
    mine = np.asarray(stft_ops.spectrogram(jnp.asarray(x), n_fft, hop,
                                           power=2.0))
    np.testing.assert_allclose(mine, ref, atol=1e-2, rtol=1e-3)


def test_istft_roundtrip_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    n_fft, hop = 512, 128
    spec = stft_ops.stft(jnp.asarray(x), n_fft, hop, window="hann")
    rec = np.asarray(stft_ops.istft(spec, n_fft, hop, window="hann",
                                    length=4096))
    np.testing.assert_allclose(rec[0], x[0], atol=1e-3)


def test_linear_upsample_matches_interpolate():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 17)).astype(np.float32)
    factor = 16
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x)[:, None, :], (17 - 1) * factor + 1,
        mode="linear", align_corners=True)[:, 0].numpy()
    mine = np.asarray(linear_upsample(jnp.asarray(x), factor))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_wavetable_lookup_matches_grid_sample():
    """Bilinear lookup == reference F.grid_sample path
    (models/synth.py:124-177)."""
    from golf_tpu.models.synth import _bilinear_table_lookup

    rng = np.random.default_rng(4)
    b, t, hop, s = 2, 400, 40, 32
    blocks = (t + hop - 1) // hop
    frames = blocks + 1
    tables = rng.standard_normal((b, frames, s)).astype(np.float32)
    phase = rng.uniform(0, 0.999, (b, t)).astype(np.float32)

    # torch reference (verbatim reference algorithm)
    tt = torch.from_numpy(tables)
    padded = torch.cat([tt, tt[:, :, :1]], dim=2)
    grid_x = torch.from_numpy(phase) * 2 - 1
    grid_y = (torch.arange(t, dtype=torch.float32).view(1, -1)
              .broadcast_to(b, -1) / (hop * blocks) * 2 - 1)
    grid = torch.stack([grid_x, grid_y], dim=2).unsqueeze(2)
    ref = torch.nn.functional.grid_sample(
        padded.unsqueeze(1), grid, mode="bilinear",
        align_corners=True).squeeze(-1).squeeze(1).numpy()

    mine = np.asarray(_bilinear_table_lookup(
        jnp.asarray(phase), jnp.asarray(tables), hop))
    np.testing.assert_allclose(mine, ref, atol=2e-5)


def test_mu_law_matches_torchaudio_formula():
    from golf_tpu.models.lpcnet import (mu_law_decode_continuous,
                                        mu_law_encode_continuous)
    x = np.linspace(-0.99, 0.99, 101).astype(np.float32)
    enc = np.asarray(mu_law_encode_continuous(jnp.asarray(x), 256))
    dec = np.asarray(mu_law_decode_continuous(jnp.asarray(enc), 256))
    np.testing.assert_allclose(dec, x, atol=1e-5)
    mu = 255.0
    ref = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    ref = (ref + 1) / 2 * mu
    np.testing.assert_allclose(enc, ref, atol=1e-4)


def test_unfold_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 100)).astype(np.float32)
    ref = torch.from_numpy(x).unfold(1, 24, 8).numpy()
    mine = np.asarray(Sig(jnp.asarray(x), 1).unfold(24, 8).data)
    np.testing.assert_array_equal(mine, ref)
