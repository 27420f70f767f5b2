"""Classic-LPC listening anchor (tools/lpc_anchor.py — the reference's
pysptk AllPoleDF low anchor, notebooks/interspeech/listening-samples.ipynb).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _vowel(sr=16000, dur=1.0, f0=140.0, seed=0):
    """Synthetic vowel: pulse train through two resonances + noise."""
    from scipy.signal import lfilter
    rng = np.random.default_rng(seed)
    t = int(sr * dur)
    n_pulses = int(dur * f0)
    x = np.zeros(t)
    x[(np.arange(n_pulses) * sr / f0).astype(int)] = 1.0
    for fc, bw in ((650.0, 80.0), (1100.0, 120.0)):
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * fc / sr
        x = lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], x)
    x += rng.standard_normal(t) * 1e-3
    return (0.3 * x / np.abs(x).max()).astype(np.float32)


def test_lpc_analysis_recovers_envelope():
    """LPC spectral envelope of the anchor analysis peaks near the true
    formants of the synthetic vowel."""
    from lpc_anchor import lpc_analysis
    sr = 16000
    x = _vowel(sr=sr)
    lpc = lpc_analysis(x, frame_length=512, hop=80, order=18)
    assert np.all(np.isfinite(lpc))
    a = np.concatenate([np.ones((lpc.shape[0], 1)), lpc[:, 1:]], axis=1)
    w = np.fft.rfftfreq(1024, 1 / sr)
    mid = lpc.shape[0] // 2
    h = 1.0 / np.abs(np.fft.rfft(a[mid], 1024))
    # strongest envelope peak within 150 Hz of a true formant
    pk = w[np.argmax(h)]
    assert min(abs(pk - 650.0), abs(pk - 1100.0)) < 150.0, pk


def test_excite_semantics():
    from lpc_anchor import excite
    hop = 80
    pitch = np.array([100.0] * 4 + [0.0] * 4)  # voiced then unvoiced
    ex = excite(pitch, hop, seed=0)
    v, u = ex[:4 * hop], ex[4 * hop:]
    # voiced: sparse sqrt(period) impulses at ~period spacing
    nz = np.flatnonzero(v)
    # pulse at stream start (phase counter begins saturated), then one
    # per period
    assert len(nz) == 4 and np.allclose(v[nz], np.sqrt(100.0))
    assert nz[0] == 0 and np.all(np.abs(np.diff(nz) - 100) <= 1)
    # unvoiced: dense unit-variance noise
    assert np.count_nonzero(u) > hop * 3 and 0.5 < u.std() < 1.5


def test_anchor_end_to_end():
    """Full chain preserves length, finiteness, and periodicity of the
    voiced input (autocorrelation peak at the pitch period)."""
    from lpc_anchor import anchor
    sr = 16000
    f0 = 140.0
    x = _vowel(sr=sr, f0=f0)
    n_f0 = int(len(x) / (0.005 * sr)) + 1
    y = anchor(x, sr, f0=np.full(n_f0, f0), order=18,
               frame_length=512, hop=80, seed=1)
    assert y.shape[0] == len(x)
    assert np.all(np.isfinite(y)) and np.abs(y).max() > 1e-3
    mid = y[len(y) // 4: 3 * len(y) // 4].astype(np.float64)
    mid = mid - mid.mean()
    ac = np.correlate(mid, mid, "full")[len(mid) - 1:]
    period = sr / f0
    lo, hi = int(period * 0.85), int(period * 1.15)
    assert ac[lo:hi].max() > 0.25 * ac[0], (ac[lo:hi].max() / ac[0])
