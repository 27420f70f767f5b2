"""Ground-truth validation of the WORLD-lite analysis stack (round-2
fidelity upgrade): DIO multi-band candidate f0 on signals with known
contours, CheapTrick envelope against a known spectral envelope, D4C
band aperiodicity against band-split harmonic/noise construction, and
analysis->synthesis round trip. Reference surface: pyworld
``dio/cheaptrick/d4c/synthesize`` (``ltng/world_ae.py:36-41``)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from golf_tpu.utils import world_lite as wl

FS = 24000


def _harmonic(f0_track, fs=FS, n_harm=12, amps=None):
    """Synthesize sum of harmonics following a sample-rate f0 track."""
    phase = np.cumsum(f0_track) / fs
    x = np.zeros_like(f0_track)
    for k in range(1, n_harm + 1):
        a = amps(k * f0_track) if amps else 1.0 / k
        x = x + a * np.sin(2 * np.pi * k * phase)
    return x * (f0_track > 0)


def test_dio_known_contour():
    t = np.arange(FS * 2) / FS
    true = 160.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t)   # slow vibrato
    x = _harmonic(true) * 0.2
    f0, tax = wl.dio(x, FS)
    true_at = np.interp(tax, t, true)
    voiced = f0 > 0
    assert voiced.mean() > 0.9                      # fully voiced signal
    err = np.abs(f0[voiced] - true_at[voiced]) / true_at[voiced]
    assert np.median(err) < 0.01, np.median(err)
    assert np.percentile(err, 90) < 0.03, np.percentile(err, 90)


def test_dio_voicing_detection():
    rng = np.random.default_rng(0)
    t = np.arange(FS * 2) / FS
    f0c = np.where(t < 1.0, 220.0, 0.0)
    x = _harmonic(f0c) * 0.2 + rng.standard_normal(len(t)) * 0.01
    f0, tax = wl.dio(x, FS)
    first = f0[(tax > 0.1) & (tax < 0.9)]
    second = f0[(tax > 1.1) & (tax < 1.9)]
    assert (first > 0).mean() > 0.85
    assert (second > 0).mean() < 0.3


def test_dio_octave_robustness():
    """A missing-fundamental-free signal with strong 2nd harmonic should
    still resolve the true f0, not the octave."""
    t = np.arange(FS * 2) / FS
    true = np.full(len(t), 130.0)
    phase = np.cumsum(true) / FS
    x = (np.sin(2 * np.pi * phase) + 0.9 * np.sin(4 * np.pi * phase)
         + 0.5 * np.sin(6 * np.pi * phase)) * 0.2
    f0, tax = wl.dio(x, FS)
    voiced = f0 > 0
    err = np.abs(f0[voiced] - 130.0) / 130.0
    assert np.median(err) < 0.01, (np.median(err), np.median(f0[voiced]))


def test_cheaptrick_known_envelope():
    """Harmonics drawn from a known smooth envelope: the estimated
    envelope at harmonic frequencies should track it within a few dB."""
    t = np.arange(FS * 2) / FS
    true = np.full(len(t), 200.0)

    def env_amp(f):
        return np.exp(-0.5 * ((f - 1200.0) / 1500.0) ** 2) + 0.05

    x = _harmonic(true, n_harm=20, amps=env_amp) * 0.1
    f0, tax = wl.dio(x, FS)
    sp = wl.cheaptrick(x, f0, tax, FS)
    fft_size = 2 * (sp.shape[1] - 1)
    freqs = np.arange(sp.shape[1]) * FS / fft_size
    mid = sp[len(sp) // 2]
    # compare envelope SHAPE at harmonics 1..15 (overall gain is
    # arbitrary): log-envelope correlation + bounded spread
    hbins = [int(round(200.0 * k * fft_size / FS)) for k in range(1, 16)]
    est_db = 10 * np.log10(mid[hbins])
    true_db = 20 * np.log10(env_amp(freqs[hbins]))
    est_db -= est_db.mean()
    true_db -= true_db.mean()
    corr = np.corrcoef(est_db, true_db)[0, 1]
    assert corr > 0.95, corr
    assert np.abs(est_db - true_db).max() < 6.0   # dB


def test_cheaptrick_level_f0_invariant():
    """Window-power normalization: envelope level must not depend on f0."""
    levels = []
    for f0v in (120.0, 240.0):
        t = np.arange(FS * 2) / FS
        track = np.full(len(t), f0v)
        x = _harmonic(track, n_harm=8, amps=lambda f: np.ones_like(f)) * 0.1
        f0, tax = wl.dio(x, FS)
        sp = wl.cheaptrick(x, f0, tax, FS)
        levels.append(10 * np.log10(sp[len(sp) // 2].sum()))
    assert abs(levels[0] - levels[1]) < 3.0, levels


def test_d4c_band_split():
    """Low-band harmonics + high-band noise: aperiodicity must be low in
    the harmonic band and high in the noise band."""
    rng = np.random.default_rng(1)
    t = np.arange(FS * 2) / FS
    true = np.full(len(t), 150.0)
    x = _harmonic(true, n_harm=12) * 0.2        # harmonics up to 1.8 kHz
    noise = rng.standard_normal(len(t))
    spec = np.fft.rfft(noise)
    fgrid = np.fft.rfftfreq(len(t), 1 / FS)
    spec[fgrid < 7000] = 0                      # high-band noise only
    x = x + np.fft.irfft(spec, len(t)) * 0.05
    f0, tax = wl.dio(x, FS)
    ap = wl.d4c(x, f0, tax, FS)
    fft_size = 2 * (ap.shape[1] - 1)
    freqs = np.arange(ap.shape[1]) * FS / fft_size
    mid = ap[(f0 > 0)].mean(0)
    low = mid[(freqs > 300) & (freqs < 1500)].mean()
    high = mid[(freqs > 8000) & (freqs < 11000)].mean()
    assert low < 0.35, low
    assert high > 0.7, high


def test_round_trip_resynthesis():
    """analysis -> synthesis preserves the spectral envelope (mel-domain
    correlation) and overall energy."""
    t = np.arange(FS * 2) / FS
    true = 180.0 + 30.0 * np.sin(2 * np.pi * 1.1 * t)
    x = _harmonic(true, n_harm=15) * 0.2
    f0, tax = wl.dio(x, FS)
    sp = wl.cheaptrick(x, f0, tax, FS)
    ap = wl.d4c(x, f0, tax, FS)
    y = wl.synthesize(f0, sp, ap, FS)
    n = min(len(x), len(y))

    def logmel(v):
        from golf_tpu.ops.stft import melspectrogram
        import jax.numpy as jnp
        m = melspectrogram(jnp.asarray(v[None], jnp.float32), FS, 1024,
                           256, 40)
        return np.log(np.asarray(m[0]) + 1e-6)

    lx, ly = logmel(x[:n]), logmel(y[:n])
    corr = np.corrcoef(lx.ravel(), ly.ravel())[0, 1]
    assert corr > 0.85, corr
    ex, ey = float(np.mean(x[:n] ** 2)), float(np.mean(y[:n] ** 2))
    assert 0.25 < ey / ex < 4.0, (ex, ey)
