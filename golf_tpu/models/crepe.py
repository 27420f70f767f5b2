"""CREPE-style strided conv pitch backbone (reference ``models/crepe.py``).

Six strided Conv1d layers producing frame-rate output at hop 256.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.sig import Sig
from .enc import BackboneModelInterface


class CREPE(BackboneModelInterface):
    channels: Tuple[int, ...] = (128, 32, 32, 128, 256, 512)
    kernels: Tuple[int, ...] = (512, 64, 64, 64, 64, 64)
    strides: Tuple[int, ...] = (4, 4, 4, 4, 2, 2)

    @nn.compact
    def __call__(self, x: Sig, f0: Optional[Sig] = None,
                 train: bool = False, out_channels: int = 0) -> Sig:
        h = x.data[..., None]                   # (B, T, 1)
        hop = 1
        for ch, k, s in zip(self.channels, self.kernels, self.strides):
            h = nn.Conv(ch, (k,), strides=(s,), padding=k // 2)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu(h)
            hop *= s
        return Sig(self.out_linear(h, out_channels), hop * x.hop)
