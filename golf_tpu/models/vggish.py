"""VGGish (AudioSet) embedder in flax — the reference's FAD embedding
network (reference ``fad.py`` / ``ltng/lpcnet.py:274-283`` via the
frechet_audio_distance / fadtk packages, which wrap torchvggish).

The ARCHITECTURE and preprocessing are reproduced here exactly
(96 x 64 log-mel patches -> VGG conv stack -> 128-d embedding, with the
torchvggish flatten order), plus a converter from the standard
``vggish-*.pth`` torch state dict. Pretrained weights are NOT bundled in
this image and cannot be downloaded from it (zero egress) — load them
from a local path when available; random-init runs are labeled
non-comparable by the caller (fad.py).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
_CHANNELS = (64, 128, 256, 256, 512, 512)
_POOL_AFTER = (0, 1, 3, 5)
# torchvggish Sequential indices of the conv / linear layers
_CONV_KEYS = ("features.0", "features.3", "features.6", "features.8",
              "features.11", "features.13")
_FC_KEYS = ("embeddings.0", "embeddings.2", "embeddings.4")
_FC_WIDTHS = (4096, 4096, 128)


class VGGish(nn.Module):
    """(N, 96, 64, 1) log-mel patches -> (N, 128) embeddings."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, ch in enumerate(_CHANNELS):
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv_{i}")(x)
            x = nn.relu(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # (N, 6, 4, 512) -> torchvggish flatten order (w, h, c): the
        # torch model permutes NCHW to (N, W, H, C) before .view(N, -1)
        n, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(n, h * w * c)
        for j, width in enumerate(_FC_WIDTHS):
            x = nn.relu(nn.Dense(width, name=f"fc_{j}")(x))
        return x


def params_from_torch_state_dict(sd: Dict) -> Dict:
    """Convert a torchvggish ``vggish-*.pth`` state dict (torch tensors
    or numpy arrays) to this module's variables."""
    def a(t):
        return np.asarray(getattr(t, "numpy", lambda: t)()
                          if hasattr(t, "numpy") else t, np.float32)

    p: Dict = {}
    for i, k in enumerate(_CONV_KEYS):
        # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
        p[f"conv_{i}"] = {"kernel": jnp.asarray(
            a(sd[k + ".weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(a(sd[k + ".bias"]))}
    for j, k in enumerate(_FC_KEYS):
        # torch linear weight (out, in) -> flax kernel (in, out)
        p[f"fc_{j}"] = {"kernel": jnp.asarray(a(sd[k + ".weight"]).T),
                        "bias": jnp.asarray(a(sd[k + ".bias"]))}
    return {"params": p}


def random_params(seed: int = 0) -> Dict:
    """Random-init variables (smoke-test / architecture-only runs)."""
    model = VGGish()
    return model.init(jax.random.key(seed),
                      jnp.zeros((1, 96, 64, 1), jnp.float32))


def log_mel_patches(wav: np.ndarray, sr: int) -> np.ndarray:
    """VGGish input frontend: resample to 16 kHz, then 0.96 s patches of
    96 x 64 log-mel frames (25 ms Hann window, 10 ms hop, 64 mel bands
    125-7500 Hz, log(mel + 0.01)) — torchvggish ``mel_features``."""
    from ..ops.stft import melscale_fbanks

    wav = np.asarray(wav, np.float64).reshape(-1)
    if sr != SAMPLE_RATE:
        from math import gcd

        from scipy.signal import resample_poly
        g = gcd(sr, SAMPLE_RATE)
        wav = resample_poly(wav, SAMPLE_RATE // g, sr // g)
    n_fft, win, hop = 512, 400, 160
    n = (len(wav) - win) // hop + 1
    if n < 96:
        wav = np.pad(wav, (0, (96 - n) * hop + win))
        n = 96
    idx = np.arange(n)[:, None] * hop + np.arange(win)[None, :]
    frames = wav[idx] * np.hanning(win)
    spec = np.abs(np.fft.rfft(frames, n_fft)) ** 2
    fb = melscale_fbanks(n_fft // 2 + 1, 125.0, 7500.0, 64, SAMPLE_RATE)
    mel = np.log(spec @ fb + 0.01)
    patches = [mel[s:s + 96] for s in range(0, n - 95, 96)]
    return np.stack(patches).astype(np.float32)


class VGGishEmbedder:
    """``embed(wav, sr) -> (n_patches, 128)`` interface for fad.py."""

    def __init__(self, variables: Dict):
        self.model = VGGish()
        self.variables = variables
        self._fn = jax.jit(lambda vs, x: self.model.apply(vs, x))

    def embed(self, wav: np.ndarray, sr: int) -> np.ndarray:
        patches = log_mel_patches(wav, sr)[..., None]   # (N, 96, 64, 1)
        return np.asarray(self._fn(self.variables, jnp.asarray(patches)))
