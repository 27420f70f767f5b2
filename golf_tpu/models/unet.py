"""Spectrogram conv-pyramid encoders (reference ``models/unet.py``).

``UNetEncoder`` is the Interspeech24 backbone: spectrogram -> stacked
Conv2d/BN/ReLU/MaxPool frequency pyramid -> flatten -> BiLSTM (or LRU
block) -> LayerNorm -> zero-init head. Layout here is NHWC
(batch, freq, time, channels) — the TPU-native conv layout.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.sig import Sig
from ..ops import stft as stft_ops
from .enc import BackboneModelInterface, _running_minmax
from .lru import LRU
from .rnn import BiLSTM


class ConvPyramid(nn.Module):
    """Conv2d((2s+1, 3)) + BN + ReLU + MaxPool((s, 1)) stack over the
    frequency axis (reference ``models/unet.py:111-132``)."""

    channels: Tuple[int, ...] = (16, 32, 64, 128)
    strides: Tuple[int, ...] = (4, 4, 4, 4)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # x: (B, freq, time, C)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for ch, s in zip(self.channels, self.strides):
            x = nn.Conv(ch, kernel_size=(2 * s + 1, 3),
                        padding=((s, s), (1, 1)), dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
            x = _strided_max(x, s, axis=1)
        return x


def env_features(spec: jax.Array, f0_d: jax.Array, sample_rate: int,
                 n_fft: int, num_harmonics: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """Frame-local harmonic/noise spectral-envelope features (reference
    ``models/unet.py:163-202``): per frame, sample the power spectrum at
    harmonic (k*f0) and inter-harmonic ((k+0.5)*f0) pickups and linearly
    remap them back onto the FFT frequency grid.

    spec: (B, freq, T) power spectrogram already truncated to the f0
    grid; f0_d: (B, T) frame-rate f0. Returns (feats, snr) with
    feats (B, freq, T, 3) = [spec, harm_env, noise_env] (linear power)
    and snr (B, freq, T, 1). Shared by the offline ``UNetEncoder`` and
    the streaming front (serve/enc_stream.py) so the two stay in exact
    parity."""
    spec_t = jnp.swapaxes(spec, 1, 2)      # (B, T, freq)
    intervals = sample_rate / n_fft
    freqs = jnp.arange(n_fft // 2 + 1) * intervals
    f0_full = jnp.where(
        f0_d > 0, f0_d, sample_rate / 2 / (num_harmonics - 1))
    pickup = f0_full[..., None] * jnp.arange(
        0.0, num_harmonics + 1, 0.5)
    idx = jnp.clip(jnp.round(pickup / intervals).astype(jnp.int32),
                   0, spec_t.shape[2] - 1)
    energies = jnp.take_along_axis(spec_t, idx, axis=2)
    harms_energy = energies[..., ::2]
    noise_energy = jnp.concatenate(
        [energies[..., :1], energies[..., 1::2]], axis=-1)

    remap = freqs / f0_full[..., None]
    lo = jnp.clip(jnp.floor(remap).astype(jnp.int32), 0,
                  num_harmonics - 2)
    p = jnp.clip(remap - lo, 0, 1)
    harm_env = ((1 - p) * jnp.take_along_axis(harms_energy, lo, 2)
                + p * jnp.take_along_axis(harms_energy, lo + 1, 2))

    remap = (freqs + f0_full[..., None] * 0.5) / f0_full[..., None]
    lo = jnp.clip(jnp.floor(remap).astype(jnp.int32), 0,
                  num_harmonics - 2)
    p = remap - lo
    p = jnp.where(lo == 0, (p - 0.5) * 2, p)
    p = jnp.clip(p, 0, 1)
    noise_env = ((1 - p) * jnp.take_along_axis(noise_energy, lo, 2)
                 + p * jnp.take_along_axis(noise_energy, lo + 1, 2))

    harm_env = jnp.maximum(harm_env, noise_env)
    feats = jnp.stack([spec_t, harm_env, noise_env], axis=-1)
    feats = jnp.swapaxes(feats, 1, 2)      # (B, freq, T, 3)
    snr = (noise_env / (harm_env + noise_env + 1e-16)) * 2
    snr = jnp.swapaxes(snr, 1, 2)[..., None]
    return feats, snr


def _strided_max(x: jax.Array, s: int, axis: int) -> jax.Array:
    """Max-pool with window == stride as a reshape-max (strided
    reduce_window is compile-pathological on the TPU toolchain)."""
    if s == 1:
        return x
    x = jnp.moveaxis(x, axis, -1)
    frames = x.shape[-1] // s
    x = x[..., : frames * s].reshape(*x.shape[:-1], frames, s).max(axis=-1)
    return jnp.moveaxis(x, -1, axis)


class LRUBlock(nn.Module):
    """Stacked LRU + MLP with predicted carry-in state (reference
    ``models/unet.py:32-83``)."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    mlp_factor: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(self.hidden_size, use_bias=False)(x)
        for i in range(self.num_layers):
            zi_re = self.param(f"zi_pred_re_{i}", nn.initializers.zeros,
                               (self.hidden_size, self.hidden_size))
            zi_im = self.param(f"zi_pred_im_{i}", nn.initializers.zeros,
                               (self.hidden_size, self.hidden_size))
            hn = nn.LayerNorm()(h)
            zi = hn[:, -1, :].astype(jnp.complex64) @ (zi_re + 1j * zi_im)
            hn, _ = LRU(self.hidden_size, self.hidden_size,
                        name=f"lru_{i}")(hn, zi)
            ff = nn.Dense(self.hidden_size * self.mlp_factor)(hn)
            ff = nn.gelu(ff)
            ff = nn.Dense(self.hidden_size)(ff)
            if self.dropout > 0:
                ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
            h = ff
        return h


class UNetEncoder(BackboneModelInterface):
    n_fft: int = 1024
    hop_length: int = 256
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    strides: Tuple[int, ...] = (4, 4, 4, 4)
    lstm_hidden_size: int = 128
    num_layers: int = 1
    dropout: float = 0.0
    include_env_features: bool = False
    num_harmonics: int = 150
    sample_rate: int = 22050
    f0_conditioning: bool = True
    use_lru: bool = False
    # 'bfloat16' runs the conv pyramid + BiLSTM in bf16 (params and the
    # DSP-parameter head stay fp32) — the MXU-friendly mixed precision
    compute_dtype: Optional[str] = None

    @property
    def _cdtype(self):
        return jnp.bfloat16 if self.compute_dtype in (
            "bfloat16", "bf16") else None

    @nn.compact
    def __call__(self, x: Sig, f0: Optional[Sig] = None,
                 train: bool = False, out_channels: int = 0) -> Sig:
        assert x.hop == 1
        spec = stft_ops.spectrogram(
            x.data, self.n_fft, self.hop_length, power=2.0, center=True)
        # spec: (B, freq, T)
        if self.f0_conditioning and f0 is not None:
            f0_d = f0.set_hop_length(self.hop_length).truncate(
                spec.shape[2]).data
            spec = spec[..., : f0_d.shape[-1]]

        if self.include_env_features and self.f0_conditioning:
            feats, snr = env_features(spec, f0_d, self.sample_rate,
                                      self.n_fft, self.num_harmonics)
        else:
            feats = spec[..., None]                # (B, freq, T, 1)
            snr = None

        log_spec = jnp.log(feats + 1e-8)
        feature = _running_minmax(self, log_spec, train)
        if snr is not None:
            feature = jnp.concatenate([feature, snr], axis=-1)

        h = ConvPyramid(tuple(self.channels), tuple(self.strides),
                        dtype=self._cdtype)(feature, train)
        # (B, freq', T, C) -> (B, T, freq'*C)
        b, fr, t, c = h.shape
        h = jnp.swapaxes(h, 1, 2).reshape(b, t, fr * c)
        if self.f0_conditioning and f0 is not None:
            h = h[:, : f0_d.shape[-1]]
            h = jnp.concatenate(
                [h, jnp.log1p(f0_d)[..., None].astype(h.dtype)], axis=-1)

        if self.use_lru:
            h = LRUBlock(h.shape[-1], self.lstm_hidden_size,
                         self.num_layers, self.dropout)(
                h.astype(jnp.float32), train)
        else:
            h = BiLSTM(self.lstm_hidden_size, self.num_layers,
                       self.dropout, dtype=self._cdtype)(h, train)
        # back to fp32 for the normalization + DSP-parameter head
        h = nn.LayerNorm()(h.astype(jnp.float32))
        return Sig(self.out_linear(h, out_channels), self.hop_length)


class UNetEncoderV2(BackboneModelInterface):
    """Harmonic-mask-embedding variant (reference ``models/unet.py:227-324``)."""

    sr: int = 24000
    embed_size: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    strides: Tuple[int, ...] = (4, 4, 4, 4)
    lstm_hidden_size: int = 128
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Sig, f0: Sig, train: bool = False,
                 out_channels: int = 0) -> Sig:
        spec = stft_ops.spectrogram(
            x.data, self.n_fft, self.hop_length, power=2.0, center=True)
        log_spec = jnp.log(spec + 1e-8)[..., None]  # (B, freq, T, 1)
        feature = _running_minmax(self, log_spec, train)

        f0_d = f0.set_hop_length(self.hop_length).truncate(
            feature.shape[2]).data
        feature = feature[:, :, : f0_d.shape[1]]

        freqs = jnp.arange(feature.shape[1]) * self.sr / self.n_fft
        harms_index = freqs[None, :, None] / jnp.maximum(
            f0_d[:, None, :], 1e-6)
        harms_mask = harms_index % 1
        harms_mask = (harms_mask < 0.25) | (harms_mask > 0.75)
        harms_mask = harms_mask & (harms_index > 0.75)
        embed = nn.Embed(2, self.embed_size)(harms_mask.astype(jnp.int32))
        feature = jnp.concatenate([feature, embed], axis=-1)

        h = ConvPyramid(tuple(self.channels), tuple(self.strides))(
            feature, train)
        b, fr, t, c = h.shape
        h = jnp.swapaxes(h, 1, 2).reshape(b, t, fr * c)
        h = jnp.concatenate([h, jnp.log1p(f0_d)[..., None]], axis=-1)
        h = BiLSTM(self.lstm_hidden_size, self.num_layers,
                   self.dropout)(h, train)
        h = nn.LayerNorm()(h)
        return Sig(self.out_linear(h, out_channels),
                   self.hop_length * x.hop)


def sinusoidal(min_scale: float = 1.0, max_scale: float = 10000.0,
               shape: Tuple[int, int] = (512, 512)) -> np.ndarray:
    """1-D sinusoidal positional embedding (reference
    ``models/unet.py:327-364``)."""
    max_len, features = shape
    position = np.arange(max_len)[:, None]
    scale_factor = -math.log(max_scale / min_scale) / (features // 2 - 1)
    div_term = min_scale * np.exp(np.arange(features // 2) * scale_factor)
    rads = position * div_term
    pe = np.zeros((max_len, features), np.float32)
    pe[:, : features // 2] = np.sin(rads)
    pe[:, features // 2:] = np.cos(rads)
    return pe


class TransformerEncoderBackbone(BackboneModelInterface):
    """Attention over frequency patches (reference ``models/unet.py:367-464``)."""

    n_fft: int = 1024
    hop_length: int = 256
    emb_channels: int = 32
    kernel_size: Tuple[int, int] = (5, 3)
    stride: int = 2
    maxpool_stride: int = 64
    nhead: int = 4
    num_attn_layers: int = 4
    lstm_hidden_size: int = 128
    dropout: float = 0.1
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: Sig, f0: Sig, train: bool = False,
                 out_channels: int = 0) -> Sig:
        assert x.hop == 1
        spec = stft_ops.spectrogram(
            x.data, self.n_fft, self.hop_length, power=2.0, center=True)
        log_spec = jnp.log(spec + 1e-8)[..., None]  # (B, freq, T, 1)
        feature = _running_minmax(self, log_spec, train)

        k1, k2 = self.kernel_size
        feature = nn.Conv(self.emb_channels, (k1, k2),
                          strides=(self.stride, 1),
                          padding=((k1 // 2, k1 // 2), (k2 // 2, k2 // 2))
                          )(feature)
        feature = nn.BatchNorm(use_running_average=not train)(feature)
        feature = nn.leaky_relu(feature, 0.2)

        b, fr, t, c = feature.shape
        pe = jnp.asarray(sinusoidal(shape=(fr, c)))
        # attend over frequency per time frame
        h = jnp.swapaxes(feature, 1, 2).reshape(b * t, fr, c) + pe
        for _ in range(self.num_attn_layers):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=c,
                dropout_rate=self.dropout, deterministic=not train)(h, h)
            h = nn.LayerNorm()(h + attn)
            ff = nn.Dense(c * 4)(h)
            ff = nn.relu(ff)
            ff = nn.Dense(c)(ff)
            h = nn.LayerNorm()(h + ff)
        h = nn.LayerNorm()(h)

        h = h.reshape(b, t, fr, c)
        # maxpool over frequency (reshape-max; see _strided_max)
        h = _strided_max(h, self.maxpool_stride, axis=2)
        h = h.reshape(b, t, -1)

        f0_d = f0.set_hop_length(self.hop_length).truncate(h.shape[1]).data
        h = h[:, : f0_d.shape[1]]
        h = jnp.concatenate([h, jnp.log1p(f0_d)[..., None]], axis=-1)
        h = BiLSTM(self.lstm_hidden_size, self.num_layers,
                   self.dropout)(h, train)
        h = nn.LayerNorm()(h)
        return Sig(self.out_linear(h, out_channels), self.hop_length)
