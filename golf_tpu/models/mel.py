"""Mel/spectrogram frame-rate backbones (reference ``models/mel.py``)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.sig import Sig
from ..ops import stft as stft_ops
from .enc import BackboneModelInterface, _running_minmax
from .rnn import BiLSTM


class Mel2Control(BackboneModelInterface):
    """Conv1d x2 + GroupNorm -> BiLSTM -> LayerNorm -> zero-init head
    (the ISMIR23 backbone; reference ``models/mel.py:10-38``)."""

    in_channels: int = 128
    hidden_channels: int = 128
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, mels: Sig, f0: Optional[Sig] = None,
                 train: bool = False, out_channels: int = 0) -> Sig:
        x = mels.data                          # (B, T, in_channels)
        x = nn.Conv(self.hidden_channels, (3,), padding=1)(x)
        x = nn.GroupNorm(num_groups=4)(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(self.hidden_channels, (3,), padding=1)(x)
        x = BiLSTM(self.hidden_channels, self.num_layers,
                   self.dropout)(x, train)
        x = nn.LayerNorm()(x)
        return Sig(self.out_linear(x, out_channels), mels.hop)


class X2Control(BackboneModelInterface):
    """Raw-wave spectrogram + log1p(f0) variant with running min/max norm
    (reference ``models/mel.py:41-68``)."""

    n_fft: int = 1024
    hop_length: int = 256
    hidden_channels: int = 128
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Sig, f0: Sig, train: bool = False,
                 out_channels: int = 0) -> Sig:
        spec = stft_ops.spectrogram(x.data, self.n_fft, self.hop_length,
                                    power=2.0, center=True)
        log_spec = jnp.log(spec + 1e-8)
        h = _running_minmax(self, log_spec, train)
        h = jnp.swapaxes(h, 1, 2)              # (B, T, bins)
        f0_d = f0.set_hop_length(self.hop_length).truncate(h.shape[1]).data
        h = h[:, : f0_d.shape[1]]
        h = jnp.concatenate([h, jnp.log1p(f0_d)[..., None]], axis=-1)
        h = nn.Conv(self.hidden_channels, (3,), padding=1)(h)
        h = nn.GroupNorm(num_groups=4)(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(self.hidden_channels, (3,), padding=1)(h)
        h = BiLSTM(self.hidden_channels, self.num_layers,
                   self.dropout)(h, train)
        h = nn.LayerNorm()(h)
        return Sig(self.out_linear(h, out_channels), self.hop_length)


class LPCFrameNet(BackboneModelInterface):
    """Small tanh CNN + FC frame net (reference ``models/mel.py:71-89``)."""

    hidden_channels: int = 128

    @nn.compact
    def __call__(self, mels: Sig, f0: Optional[Sig] = None,
                 train: bool = False, out_channels: int = 0) -> Sig:
        x = mels.data
        x = jnp.tanh(nn.Conv(self.hidden_channels, (3,), padding=1)(x))
        x = jnp.tanh(nn.Conv(self.hidden_channels, (3,), padding=1)(x))
        x = jnp.tanh(nn.Dense(self.hidden_channels)(x))
        return Sig(self.out_linear(x, out_channels), mels.hop)


class NonCausalWaveNetLayer(nn.Module):
    """Gated dilated conv layer (reference ``models/mel.py:97-126``)."""

    radix: int
    dilation: int
    residual_channels: int
    last_layer: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        pad = self.dilation * (self.radix - 1) // 2
        z = nn.Conv(self.residual_channels * 2, (self.radix,),
                    kernel_dilation=self.dilation, padding=pad)(x)
        zw, zf = jnp.split(z, 2, axis=-1)
        z = jnp.tanh(zw) * jax.nn.sigmoid(zf)
        if self.last_layer:
            skip = nn.Conv(self.residual_channels, (1,))(z)
            return None, skip
        out = nn.Conv(self.residual_channels * 2, (1,))(z)
        res, skip = jnp.split(out, 2, axis=-1)
        return res + x, skip


class WN(BackboneModelInterface):
    """Non-causal WaveNet backbone (reference ``models/mel.py:129-169``)."""

    residual_channels: int = 128
    depth: int = 20
    cycle: int = 6
    radix: int = 3

    @nn.compact
    def __call__(self, mels: Sig, f0: Optional[Sig] = None,
                 train: bool = False, out_channels: int = 0) -> Sig:
        dilations = [2 ** (i % self.cycle) for i in range(self.depth)]
        x = nn.Conv(self.residual_channels, (1,))(mels.data)
        cum_skip = 0.0
        for i, d in enumerate(dilations):
            x, skip = NonCausalWaveNetLayer(
                self.radix, d, self.residual_channels,
                last_layer=(i == len(dilations) - 1))(x)
            cum_skip = cum_skip + skip
        out = nn.Conv(out_channels, (1,))(cum_skip)
        return Sig(out, mels.hop)
