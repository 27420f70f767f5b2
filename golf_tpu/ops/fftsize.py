"""FFT size selection shared by the frame-conv and resampling paths.

XLA TPU FFT handles small-prime (5-smooth) sizes natively; a snug
2^a 3^b 5^c size can cut padded FFT work vs the next power of two
(1199 -> 1200 instead of 2048). Gated behind GOLF_TPU_FFT_5SMOOTH until
the on-chip probe (tools/fft_size_probe.py) decides the default — if TPU
FFT fell back to Bluestein for these sizes it would be a pessimization.
"""

from __future__ import annotations

import os


def smooth_fft_size(n: int) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) integer >= n."""
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


def conv_fft_size(n: int) -> int:
    if os.environ.get("GOLF_TPU_FFT_5SMOOTH"):
        return smooth_fft_size(n)
    return 1 << (n - 1).bit_length()
