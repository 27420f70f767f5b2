"""Multi-resolution STFT losses (reference ``loss/spec.py``).

SSSLoss: |STFT| L1 + alpha * log2-magnitude L1.
MSSLoss: sum over n_ffts at 75% overlap. ISMIR uses [1024, 2048, 512];
Interspeech uses primes [509, 1021, 2053] (``cfg/ae/vctk.yaml:61-64``).
MSSLossV2: pluggable distance/compression.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..core.sig import Sig
from ..ops import stft as stft_ops


def _as_array(x):
    return x.data if isinstance(x, Sig) else x


@dataclasses.dataclass(frozen=True)
class SSSLoss:
    """Single-scale spectral loss (reference :11-29)."""

    n_fft: int
    alpha: float = 1.0
    window: str = "hann"
    hop_length: Optional[int] = None
    center: bool = True
    eps: float = 1e-8

    def __call__(self, pred, target) -> jax.Array:
        hop = self.hop_length or self.n_fft // 4
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            assert self.center, "sharded SSS requires center=True"
            return seqpar.sss_loss_sharded(
                _as_array(pred), _as_array(target), self.n_fft, hop,
                self.alpha, self.window, self.eps, env)
        s_pred = stft_ops.spectrogram(
            _as_array(pred), self.n_fft, hop, window=self.window,
            power=1.0, center=self.center)
        s_true = stft_ops.spectrogram(
            _as_array(target), self.n_fft, hop, window=self.window,
            power=1.0, center=self.center)
        linear = jnp.mean(jnp.abs(s_pred - s_true))
        log = jnp.mean(jnp.abs(jnp.log2(s_true + self.eps)
                               - jnp.log2(s_pred + self.eps)))
        return linear + self.alpha * log


@dataclasses.dataclass(frozen=True)
class MSSLoss:
    """Multi-scale spectral loss (reference :32-67)."""

    n_ffts: Sequence[int]
    alpha: float = 1.0
    ratio: float = 1.0
    overlap: float = 0.75
    window: str = "hann"
    center: bool = True

    def __call__(self, pred, target) -> jax.Array:
        total = 0.0
        for n_fft in self.n_ffts:
            hop = int(n_fft - n_fft * self.overlap)
            total = total + SSSLoss(
                n_fft=n_fft, alpha=self.alpha, window=self.window,
                hop_length=hop, center=self.center)(pred, target)
        return self.ratio * total


@dataclasses.dataclass(frozen=True)
class MSSLossV2:
    """Revisited MSS with pluggable distance/compression (reference
    :70-120)."""

    n_ffts: Sequence[int]
    distance: str = "l1"           # 'l1' | 'l2'
    compression: str = "log1p"     # 'log1p' | 'log' | 'id'
    window: str = "hann"
    overlap: float = 0.75
    ratio: float = 1.0

    def _compress(self, x):
        if self.compression == "log1p":
            return jnp.log1p(x)
        if self.compression == "log":
            return jnp.log(x + 1e-7)
        if self.compression == "id":
            return x
        raise ValueError(f"Unknown compression: {self.compression}")

    def _dist(self, a, b):
        if self.distance == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.distance == "l2":
            return jnp.mean((a - b) ** 2)
        raise ValueError(f"Unknown distance: {self.distance}")

    def __call__(self, pred, target) -> jax.Array:
        total = 0.0
        for n_fft in self.n_ffts:
            hop = int(n_fft - n_fft * self.overlap)
            sp = stft_ops.spectrogram(_as_array(pred), n_fft, hop,
                                      window=self.window, power=1.0)
            st = stft_ops.spectrogram(_as_array(target), n_fft, hop,
                                      window=self.window, power=1.0)
            total = total + self._dist(self._compress(sp),
                                       self._compress(st))
        return self.ratio * total
