#!/usr/bin/env python
"""PESQ evaluation over mirrored directory trees (reference
``eval_pesq.py``): parallel read -> resample to 16 k -> ITU-T P.862 ->
mean ± std.

The C ``pesq`` library is optional in this image; when absent, a pure
numpy PESQ-proxy (frequency-weighted segmental SNR mapped to the MOS-LQO
range) is used and clearly labeled.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
from multiprocessing import Pool

import numpy as np

from golf_tpu.utils.wav import read_wav

try:
    from pesq import pesq as _pesq  # optional ITU C library
    HAS_PESQ = True
except ImportError:
    HAS_PESQ = False

# first-party native P.862 implementation (native/pesq862.cpp)
from golf_tpu.utils import pesq862 as _pesq862
HAS_NATIVE_PESQ = _pesq862.available()


def resample_to(x: np.ndarray, sr: int, target: int) -> np.ndarray:
    if sr == target:
        return x
    from scipy.signal import resample_poly
    from math import gcd
    g = gcd(sr, target)
    return resample_poly(x, target // g, sr // g)


def _fwsegsnr_mos(ref: np.ndarray, deg: np.ndarray, sr: int) -> float:
    """Frequency-weighted segmental SNR -> rough MOS mapping (proxy metric
    when the ITU pesq C library is unavailable)."""
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    frame = 512
    hop = 256
    n_frames = max(1, (n - frame) // hop)
    snrs = []
    win = np.hanning(frame)
    for i in range(n_frames):
        r = ref[i * hop: i * hop + frame] * win
        d = deg[i * hop: i * hop + frame] * win
        rs = np.abs(np.fft.rfft(r)) ** 2
        ds = np.abs(np.fft.rfft(d)) ** 2
        w = rs ** 0.2
        err = np.maximum((np.sqrt(rs) - np.sqrt(ds)) ** 2, 1e-12)
        snr = 10 * np.log10(np.maximum(rs, 1e-12) / err)
        snrs.append(np.sum(w * np.clip(snr, -10, 35)) / np.sum(w))
    m = float(np.mean(snrs))
    return float(np.clip(1.0 + 3.5 * (m + 10) / 45.0, 1.0, 4.5))


def score_pair(pair):
    ref_path, deg_path = pair
    ref, sr1 = read_wav(str(ref_path))
    deg, sr2 = read_wav(str(deg_path))
    ref = resample_to(ref.reshape(-1), sr1, 16000)
    deg = resample_to(deg.reshape(-1), sr2, 16000)
    n = min(len(ref), len(deg))
    if HAS_PESQ:
        return _pesq(16000, ref[:n], deg[:n], "wb")
    if HAS_NATIVE_PESQ:
        return _pesq862.pesq(ref[:n], deg[:n], 16000, "wb")
    return _fwsegsnr_mos(ref[:n], deg[:n], 16000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_dir")
    ap.add_argument("deg_dir")
    ap.add_argument("--suffix", default=".wav")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    ref_dir = pathlib.Path(args.ref_dir)
    deg_dir = pathlib.Path(args.deg_dir)
    pairs = []
    for deg in sorted(deg_dir.glob("**/*" + args.suffix)):
        rel = deg.relative_to(deg_dir)
        ref = ref_dir / rel
        if ref.exists():
            pairs.append((ref, deg))
    if not pairs:
        raise SystemExit("no matched file pairs")

    with Pool(args.workers) as pool:
        scores = pool.map(score_pair, pairs)
    scores = np.asarray(scores)
    label = ("PESQ" if HAS_PESQ else
             "PESQ(p862-native)" if HAS_NATIVE_PESQ else
             "PESQ-proxy(fwSNRseg)")
    print(f"{label}: {scores.mean():.3f} +/- {scores.std():.3f} "
          f"(n={len(scores)})")
    if not HAS_PESQ and HAS_NATIVE_PESQ:
        print("# p862-native is rank-calibrated (Spearman 1.0 on every "
              "battery family) but absolutely lenient on speech-"
              "modulated noise; compare only against same-pipeline "
              "baselines (docs/PESQ862.md)", file=sys.stderr)


if __name__ == "__main__":
    main()
