"""Noise sources (reference ``models/noise.py``).

torch ``randn_like`` becomes explicit ``jax.random`` keys threaded through
flax's rng collections: every noise module draws from ``make_rng('noise')``.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as scipy_signal

from ..core.sig import Sig
from .ctrl import Controllable


class NoiseInterface(Controllable):
    pass


class StandardNormalNoise(NoiseInterface):
    """randn_like (reference :30-35).

    Under time sharding the draw is made over the GLOBAL (B, T) shape and
    window-sliced so the noise field is independent of the mesh layout."""

    @nn.compact
    def __call__(self, ref: Sig, *args, **kwargs) -> Sig:
        from ..parallel import seqpar
        key = self.make_rng("noise")
        env = seqpar.current()
        if env is not None and ref.ndim == 2:
            return ref.new(seqpar.slice_global_rng(
                key, (env.b_global, env.t_global), env, "normal",
                ref.dtype))
        return ref.new(jax.random.normal(key, ref.shape, ref.dtype))


class UniformNoise(NoiseInterface):
    """Unit-variance uniform (reference :38-43)."""

    @nn.compact
    def __call__(self, ref: Sig, *args, **kwargs) -> Sig:
        from ..parallel import seqpar
        key = self.make_rng("noise")
        env = seqpar.current()
        if env is not None and ref.ndim == 2:
            u = seqpar.slice_global_rng(
                key, (env.b_global, env.t_global), env, "uniform",
                ref.dtype)
        else:
            u = jax.random.uniform(key, ref.shape, ref.dtype)
        return ref.new((u - 0.5) * 2 * math.sqrt(3))


class SignFlipNoise(NoiseInterface):
    """Alternating +-1 with a random per-sequence sign (reference :46-55)."""

    @nn.compact
    def __call__(self, ref: Sig, *args, **kwargs) -> Sig:
        key = self.make_rng("noise")
        sign = jnp.sign(jax.random.uniform(
            key, ref.shape[:-1], ref.dtype, -1.0, 1.0))
        t = jnp.arange(ref.shape[-1])
        alt = jnp.where(t % 2 == 0, 1.0, -1.0)
        return ref.new(sign[..., None] * alt)


def _design_noise_bands(n_filters: int, fs: int, attenuation: float,
                        normalize: bool, seed: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """DDSP-noise-band filterbank design (reference ``NoiseBand``,
    ``models/noise.py:58-213``): kaiser-designed LPF/BPF/HPF bank ->
    random-phase IFFT -> loopable noise bands. Host-side, once, at build."""
    edges = np.linspace(0, fs / 2, n_filters + 1)
    bands = np.stack([edges[1:-2], edges[2:-1]], axis=1)

    centers = np.concatenate([
        [bands[0, 0] / 2], bands.mean(axis=1),
        [((fs / 2) + bands[-1, -1]) / 2]])

    def design(cutoff, pass_zero):
        if np.ndim(cutoff) > 0 and np.size(cutoff) > 1:
            bw = abs(cutoff[1] - cutoff[0])
        elif pass_zero:
            bw = float(cutoff)
        else:
            bw = abs(fs / 2 - float(cutoff))
        width = bw / (fs / 2) * 0.2
        n, beta = scipy_signal.kaiserord(ripple=attenuation, width=width)
        n = 2 * (n // 2) + 1
        return scipy_signal.firwin(n, cutoff, window=("kaiser", beta),
                                   scale=True, fs=fs, pass_zero=pass_zero)

    filters = [design(bands[0, 0], True)]
    for i in range(bands.shape[0]):
        filters.append(design(bands[i], False))
    filters.append(design(bands[-1, -1], False))

    max_len = max(len(f) for f in filters)
    noise_len = 2 ** math.ceil(math.log2(max_len))
    mat = np.stack([np.concatenate([np.zeros(noise_len - len(f)), f])
                    for f in filters])
    mag = np.abs(np.fft.rfft(mat, axis=-1))
    rng = np.random.default_rng(seed)
    phase = np.exp(1j * rng.uniform(0, 2 * np.pi, mag.shape))
    phase[:, 0] = 0
    phase[:, -1] = 0
    noise_bands = np.fft.irfft(mag * phase, axis=-1)
    if normalize:
        noise_bands = noise_bands / np.abs(noise_bands).max()
    return noise_bands.astype(np.float32), centers.astype(np.float32)


class NoiseBand(NoiseInterface):
    """Filterbank of precomputed loopable noise bands, mixed by per-frame
    gains with random circular offsets at runtime."""

    n_filters: int = 1024
    fs: int = 44100
    attenuation: float = 50.0
    normalize_noise_bands: bool = True

    def setup(self):
        bands, centers = _design_noise_bands(
            self.n_filters, self.fs, self.attenuation,
            self.normalize_noise_bands)
        self._bands = jnp.asarray(bands)
        self._centers = jnp.asarray(centers)

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.n_filters,)

    def ctrl(self, log_gain: Sig) -> Tuple[Sig, ...]:
        return (log_gain,)

    def __call__(self, ref: Sig, log_gain: Sig) -> Sig:
        gain = Sig(jnp.exp(log_gain.data), log_gain.hop)
        b, t = ref.shape[0], ref.shape[1]
        num_bands, bands_len = self._bands.shape
        key = self.make_rng("noise")
        offset = jax.random.randint(key, (b, num_bands), 0, bands_len)
        idx = (jnp.arange(t)[None, None, :] + offset[:, :, None]) % bands_len
        noise = jnp.take_along_axis(
            jnp.broadcast_to(self._bands[None], (b, num_bands, bands_len)),
            idx, axis=2)                      # (B, bands, T)
        mixed = Sig(jnp.swapaxes(noise, 1, 2), 1) * gain  # (B, T, bands)
        return mixed.sum(axis=2)
