"""Encoder interface: one linear head, sliced into named parameter groups.

Reference ``models/enc.py``: ``VocoderParameterEncoderInterface`` wraps any
backbone, prepends learned-f0 (sigmoid -> log-spaced f0_min..f0_max Hz) and
voicing-logit heads, and splits the backbone output channel-wise per the
decoder's declared ``split_sizes``. Raw groups are returned; the decoder
applies its own ctrl transforms (see ``golf_tpu.models.ctrl``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.sig import Sig
from ..ops import stft as stft_ops
from .ctrl import split_heads


class BackboneModelInterface(nn.Module):
    """Base with the zero-initialized output linear (reference
    ``models/enc.py:18-30``) — parameters start at the DSP prior."""

    def out_linear(self, x: jax.Array, out_channels: int) -> jax.Array:
        return nn.Dense(out_channels, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="out_linear")(x)


def _running_minmax(mdl: nn.Module, value: jax.Array, train: bool,
                    prefix: str = "log_spec"):
    """Running min/max normalization buffers (reference pattern at
    ``models/unet.py:206-213``): mutable 'stats' collection, updated during
    training, persisted in checkpoints."""
    vmin = mdl.variable("stats", f"{prefix}_min",
                        lambda: jnp.asarray(jnp.inf))
    vmax = mdl.variable("stats", f"{prefix}_max",
                        lambda: jnp.asarray(-jnp.inf))
    new_min = jnp.minimum(vmin.value, jnp.min(value))
    new_max = jnp.maximum(vmax.value, jnp.max(value))
    if train:
        vmin.value = new_min
        vmax.value = new_max
        lo, hi = new_min, new_max
    else:
        lo, hi = vmin.value, vmax.value
    return (value - lo) / (hi - lo)


class VocoderParameterEncoderInterface(nn.Module):
    backbone: nn.Module
    split_sizes: Tuple[Tuple[int, ...], ...] = ()
    args_keys: Tuple[str, ...] = ()
    learn_voicing: bool = False
    learn_f0: bool = True
    f0_min: float = 80.0
    f0_max: float = 1000.0

    @property
    def full_layout(self) -> Tuple[Tuple[Tuple[int, ...], ...],
                                   Tuple[str, ...]]:
        sizes, keys = self.split_sizes, self.args_keys
        if self.learn_voicing:
            sizes = ((1,),) + tuple(sizes)
            keys = ("voicing_logits",) + tuple(keys)
        if self.learn_f0:
            sizes = ((1,),) + tuple(sizes)
            keys = ("f0",) + tuple(keys)
        return sizes, keys

    @property
    def total_channels(self) -> int:
        sizes, _ = self.full_layout
        return sum(s for group in sizes for s in group)

    def __call__(self, x: Sig, f0: Optional[Sig] = None,
                 train: bool = False) -> Dict[str, Any]:
        h = self.backbone(x, f0=f0, train=train,
                          out_channels=self.total_channels)
        sizes, keys = self.full_layout
        groups = split_heads(h, sizes, keys)
        params: Dict[str, Any] = {}
        for key, group in groups.items():
            if key == "f0":
                logits = group[0]
                f0_hat = jnp.exp(
                    jax.nn.sigmoid(logits.data)
                    * (math.log(self.f0_max) - math.log(self.f0_min))
                    + math.log(self.f0_min))
                params["f0"] = Sig(f0_hat, logits.hop)
            elif key == "voicing_logits":
                params["voicing_logits"] = group[0]
            else:
                params[key] = group
        return params


class F0EnergyEncoder(BackboneModelInterface):
    """Harmonic-comb energy sampling at k*f0/2 + BiLSTM backbone
    (reference ``models/enc.py:103-186``)."""

    sr: int = 24000
    n_fft: int = 2048
    win_length: int = 960
    window: str = "hanning"
    hop_length: int = 240
    num_bands: int = 150
    lstm_hidden_size: int = 128
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: Sig, f0: Sig, train: bool = False,
                 out_channels: int = 0) -> Sig:
        assert x.hop == 1
        spec = stft_ops.spectrogram(
            x.data, self.n_fft, self.hop_length, self.win_length,
            self.window, power=2.0, center=True)
        spec = jnp.swapaxes(spec, 1, 2)           # (B, T, bins)
        spec = spec.at[..., -1].set(0.0)
        f0_d = f0.set_hop_length(self.hop_length).truncate(
            spec.shape[1]).data
        spec = spec[:, : f0_d.shape[1]]
        f0_nz = jnp.where(f0_d > 0, f0_d, self.sr / self.num_bands * 0.5)
        ks = jnp.arange(1, self.num_bands + 0.5, 0.5)
        harms = f0_nz[..., None] * ks
        harms = jnp.concatenate([harms[..., :1] * 0.5, harms], axis=-1)
        freq_interval = self.sr / self.n_fft
        idx = jnp.clip(jnp.round(harms / freq_interval).astype(jnp.int32),
                       0, spec.shape[-1] - 1)
        energy = jnp.take_along_axis(spec, idx, axis=-1)
        log_energy = jnp.log(energy + 1e-8)
        feat = _running_minmax(self, log_energy, train, "log_energy")
        feat = jnp.concatenate(
            [feat, jnp.log(f0_nz)[..., None]], axis=-1)

        from .rnn import BiLSTM
        h = BiLSTM(self.lstm_hidden_size, self.num_layers)(feat, train)
        h = nn.LayerNorm()(h)
        return Sig(self.out_linear(h, out_channels), self.hop_length)
