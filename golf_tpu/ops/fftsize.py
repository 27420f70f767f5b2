"""FFT size selection shared by the frame-conv and resampling paths.

On-chip probe result (tools/fft_size_probe.py, v5e,
docs/results_r4/fft_size_probe.json, 6432 x ~1199-point frame convs):

    nfft   odd part   ms      nfft   odd part   ms
    1200      75     5.04     1440      45     1.96   <- fastest
    1250     625     4.93     1500     375     7.08
    1280       5     2.21     1536       3     2.67
    2048       1     3.16     4096       1     8.60

XLA TPU FFT runs sizes with a SMALL odd part (measured fast up to 45 =
3^2*5) through its native mixed-radix path; snug 5-smooth sizes with a
LARGE odd part (1200 = 2^4*75) fall back to a Bluestein-class lowering
and are SLOWER than the next power of two. The round-3
GOLF_TPU_FFT_5SMOOTH flag (snug 5-smooth) would therefore have been a
pessimization at the serving shape (1199 -> 1200); it is deleted.

Default policy: the smallest 2^a * m >= n with m in {1, 3, 5, 9, 15, 45}
(9/15 are sub-factorizations of the measured-fast 45). For 1199 this
picks 1280 (2.21 ms vs 3.16 ms at 2048, a 30% cut). Set
GOLF_TPU_FFT_POW2=1 to force next-power-of-two sizes.
"""

from __future__ import annotations

import os

_FAST_ODD = (1, 3, 5, 9, 15, 45)


def smooth_fft_size(n: int) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) integer >= n. NOT the default —
    kept for the probe tool; large odd parts are slow on TPU (above)."""
    best = 1 << (n - 1).bit_length()
    p5 = 1
    while p5 <= best:
        p35 = p5
        while p35 <= best:
            m = p35
            while m < n:
                m *= 2
            best = min(best, m)
            p35 *= 3
        p5 *= 5
    return best


def fast_fft_size(n: int) -> int:
    """Smallest 2^a * m >= n with m in the measured-fast odd family."""
    best = 1 << (n - 1).bit_length()
    for m in _FAST_ODD[1:]:
        c = m
        while c < n:
            c *= 2
        best = min(best, c)
    return best


def conv_fft_size(n: int) -> int:
    if os.environ.get("GOLF_TPU_FFT_POW2"):
        return 1 << (n - 1).bit_length()
    return fast_fft_size(n)
