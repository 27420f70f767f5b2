"""DAC-24kHz encoder embedder in flax — the reference's DEFAULT FAD
embedding network (reference ``fad.py:13-74``: descript-audio-codec
encoder, 1024-d latents at 24 kHz, 5 s / 50 %-overlap windows with
-16 LUFS loudness normalization).

The ARCHITECTURE (Snake activations, weight-normed convs, dilated
residual units, strides [2, 4, 5, 8] -> 320x downsampling, 1024-d output)
and the fadtk windowing/loudness protocol are reproduced here exactly,
plus a converter from the descript-audio-codec ``weights.pth`` torch
state dict (weight_norm g/v pairs folded into effective kernels).
Pretrained weights are NOT bundled in this image and cannot be downloaded
from it (zero egress) — load them from a local path when available;
random-init runs are labeled non-comparable by the caller (fad.py).

Reference topology (descript-audio-codec dac/model/dac.py):
  Encoder = WNConv1d(1, 64, k7 p3)
            -> EncoderBlock(128, s2) -> EncoderBlock(256, s4)
            -> EncoderBlock(512, s5) -> EncoderBlock(1024, s8)
            -> Snake1d -> WNConv1d(1024, 1024, k3 p1)
  EncoderBlock(d, s) = ResUnit(d/2, dil 1) -> ResUnit(d/2, dil 3)
            -> ResUnit(d/2, dil 9) -> Snake1d
            -> WNConv1d(d/2, d, k=2s, stride s, p=ceil(s/2))
  ResUnit(d, dil) = Snake1d -> WNConv1d(d, d, k7, dil, p=3*dil)
            -> Snake1d -> WNConv1d(d, d, k1); out = x[trim] + block(x)
  snake(x) = x + sin^2(alpha x) / (alpha + 1e-9)
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24000
ENCODER_DIM = 64
ENCODER_RATES = (2, 4, 5, 8)
LATENT_DIM = ENCODER_DIM * 2 ** len(ENCODER_RATES)   # 1024
HOP = int(np.prod(ENCODER_RATES))                    # 320


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """x: (B, T, C), alpha: (C,)."""
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


class _Snake(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones_init(),
                           (self.channels,))
        return snake(x, alpha)


class _Conv(nn.Module):
    """Conv1d with torch padding semantics; weights are the FOLDED
    weight-norm kernels (the converter divides v by its norm and scales
    by g, so inference needs no norm at runtime)."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel,), strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(self.padding, self.padding)], name="conv")(x)


class _ResidualUnit(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        y = _Snake(self.dim, name="snake_0")(x)
        y = _Conv(self.dim, 7, dilation=self.dilation,
                  padding=3 * self.dilation, name="conv_0")(y)
        y = _Snake(self.dim, name="snake_1")(y)
        y = _Conv(self.dim, 1, name="conv_1")(y)
        pad = (x.shape[1] - y.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad]
        return x + y


class _EncoderBlock(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        h = self.dim // 2
        x = _ResidualUnit(h, 1, name="res_0")(x)
        x = _ResidualUnit(h, 3, name="res_1")(x)
        x = _ResidualUnit(h, 9, name="res_2")(x)
        x = _Snake(h, name="snake")(x)
        return _Conv(self.dim, 2 * self.stride, stride=self.stride,
                     padding=math.ceil(self.stride / 2), name="down")(x)


class DACEncoder(nn.Module):
    """(B, T, 1) waveform -> (B, T // 320, 1024) latents."""

    d_model: int = ENCODER_DIM
    strides: Sequence[int] = ENCODER_RATES
    d_latent: int = LATENT_DIM

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        x = _Conv(d, 7, padding=3, name="conv_in")(x)
        for i, s in enumerate(self.strides):
            d *= 2
            x = _EncoderBlock(d, s, name=f"block_{i}")(x)
        x = _Snake(d, name="snake_out")(x)
        return _Conv(self.d_latent, 3, padding=1, name="conv_out")(x)


# ---------------------------------------------------------------------------
# torch state-dict conversion (weight_norm folding)
# ---------------------------------------------------------------------------

def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _folded_conv(sd: Dict, prefix: str) -> Dict:
    """Fold weight_norm: w = g * v / ||v||_(in,k), per out channel.
    Accepts classic ``weight_g``/``weight_v`` keys or the torch>=2.1
    parametrize layout ``parametrizations.weight.original{0,1}``."""
    if prefix + ".weight_v" in sd:
        g, v = _np(sd[prefix + ".weight_g"]), _np(sd[prefix + ".weight_v"])
    elif prefix + ".parametrizations.weight.original0" in sd:
        g = _np(sd[prefix + ".parametrizations.weight.original0"])
        v = _np(sd[prefix + ".parametrizations.weight.original1"])
    else:  # plain conv
        w = _np(sd[prefix + ".weight"])
        return {"conv": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                         "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}}
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)            # (out, in, k)
    return {"conv": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                     "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}}


def _alpha(sd: Dict, prefix: str) -> Dict:
    return {"alpha": jnp.asarray(_np(sd[prefix + ".alpha"]).reshape(-1))}


def params_from_torch_state_dict(sd: Dict) -> Dict:
    """Convert a descript-audio-codec state dict (full DAC or encoder-only)
    to this module's variables. DAC Sequential indices: block.0 conv_in,
    block.1-4 EncoderBlocks, block.5 Snake, block.6 conv_out; inside an
    EncoderBlock: block.0-2 ResidualUnits, block.3 Snake, block.4 down;
    inside a ResidualUnit: block.0/2 Snakes, block.1/3 convs."""
    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}

    p: Dict = {"conv_in": _folded_conv(sd, "block.0"),
               "snake_out": _alpha(sd, "block.5"),
               "conv_out": _folded_conv(sd, "block.6")}
    for i in range(4):
        eb = f"block.{i + 1}.block"
        blk = {}
        for r in range(3):
            ru = f"{eb}.{r}.block"
            blk[f"res_{r}"] = {
                "snake_0": _alpha(sd, f"{ru}.0"),
                "conv_0": _folded_conv(sd, f"{ru}.1"),
                "snake_1": _alpha(sd, f"{ru}.2"),
                "conv_1": _folded_conv(sd, f"{ru}.3"),
            }
        blk["snake"] = _alpha(sd, f"{eb}.3")
        blk["down"] = _folded_conv(sd, f"{eb}.4")
        p[f"block_{i}"] = blk
    return {"params": p}


def random_params(seed: int = 0) -> Dict:
    model = DACEncoder()
    return model.init(jax.random.key(seed),
                      jnp.zeros((1, HOP * 4, 1), jnp.float32))


# ---------------------------------------------------------------------------
# fadtk DAC24k embedding protocol (reference fad.py:30-69)
# ---------------------------------------------------------------------------

def _k_weighting_coeffs(fs: float) -> Tuple[np.ndarray, np.ndarray]:
    """ITU-R BS.1770-4 K-weighting as two biquads (pyloudnorm /
    audiotools coefficients): stage-1 spherical-head high shelf,
    stage-2 RLB high pass."""
    def shelf(G, Q, fc):
        A = 10.0 ** (G / 40.0)
        w0 = 2.0 * np.pi * fc / fs
        alpha = np.sin(w0) / (2.0 * Q)
        b = np.array([A * ((A + 1) + (A - 1) * np.cos(w0)
                           + 2 * np.sqrt(A) * alpha),
                      -2 * A * ((A - 1) + (A + 1) * np.cos(w0)),
                      A * ((A + 1) + (A - 1) * np.cos(w0)
                           - 2 * np.sqrt(A) * alpha)])
        a = np.array([(A + 1) - (A - 1) * np.cos(w0)
                      + 2 * np.sqrt(A) * alpha,
                      2 * ((A - 1) - (A + 1) * np.cos(w0)),
                      (A + 1) - (A - 1) * np.cos(w0)
                      - 2 * np.sqrt(A) * alpha])
        return b / a[0], a / a[0]

    def highpass(Q, fc):
        w0 = 2.0 * np.pi * fc / fs
        alpha = np.sin(w0) / (2.0 * Q)
        b = np.array([(1 + np.cos(w0)) / 2, -(1 + np.cos(w0)),
                      (1 + np.cos(w0)) / 2])
        a = np.array([1 + alpha, -2 * np.cos(w0), 1 - alpha])
        return b / a[0], a / a[0]

    b1, a1 = shelf(3.99984385397, 0.7071752369554196, 1681.974450955533)
    b2, a2 = highpass(0.5003270373238773, 38.13547087602444)
    return np.stack([b1, b2]), np.stack([a1, a2])


def integrated_loudness(wav: np.ndarray, sr: int) -> float:
    """BS.1770-4 gated integrated loudness (mono), pyloudnorm semantics:
    K-weighting, 400 ms blocks / 75 % overlap, -70 LUFS absolute gate,
    -10 LU relative gate."""
    from scipy.signal import lfilter

    x = np.asarray(wav, np.float64).reshape(-1)
    bs, as_ = _k_weighting_coeffs(sr)
    for b, a in zip(bs, as_):
        x = lfilter(b, a, x)
    block = int(0.4 * sr)
    step = int(0.1 * sr)
    if len(x) < block:
        x = np.pad(x, (0, block - len(x)))
    n = (len(x) - block) // step + 1
    starts = np.arange(n) * step
    ms = np.array([np.mean(x[s:s + block] ** 2) for s in starts])
    with np.errstate(divide="ignore"):
        lb = -0.691 + 10 * np.log10(np.maximum(ms, 1e-30))
    keep = lb > -70.0
    if not np.any(keep):
        return -70.0
    rel_thresh = -0.691 + 10 * np.log10(np.mean(ms[keep])) - 10.0
    keep = keep & (lb > rel_thresh)
    if not np.any(keep):
        return -70.0
    return float(-0.691 + 10 * np.log10(np.mean(ms[keep])))


def dac_windows(wav: np.ndarray, sr: int) -> np.ndarray:
    """fadtk DAC24k preprocessing (reference fad.py:36-54): resample to
    24 kHz, normalize to -16 LUFS, clamp peaks to 1, zero-pad to a
    multiple of the 5 s window, 50 %-overlap windows -> (n_win, W)."""
    wav = np.asarray(wav, np.float64).reshape(-1)
    if sr != SAMPLE_RATE:
        from math import gcd

        from scipy.signal import resample_poly
        g = gcd(sr, SAMPLE_RATE)
        wav = resample_poly(wav, SAMPLE_RATE // g, sr // g)
        sr = SAMPLE_RATE
    # audiotools normalize(-16) + ensure_max_of_audio()
    gain_db = -16.0 - max(integrated_loudness(wav, sr), -70.0)
    wav = wav * 10.0 ** (gain_db / 20.0)
    peak = np.abs(wav).max()
    if peak > 1.0:
        wav = wav / peak
    # win_len = ((5.0 * sr) // 4) * 4 samples (divisible by 4)
    win = int(((5.0 * sr) // 4) * 4)
    hop = win // 2
    dur = len(wav) / sr
    pad_len = int(math.ceil(dur / (win / sr)) * win)
    wav = np.pad(wav, (0, max(0, pad_len - len(wav))))
    starts = np.arange(0, len(wav) - win + 1, hop)
    return np.stack([wav[s:s + win] for s in starts]).astype(np.float32)


class DACEmbedder:
    """``embed(wav, sr) -> (n_frames, 1024)`` interface for fad.py."""

    def __init__(self, variables: Dict):
        self.model = DACEncoder()
        self.variables = variables
        self._fn = jax.jit(lambda vs, x: self.model.apply(vs, x))

    def embed(self, wav: np.ndarray, sr: int) -> np.ndarray:
        wins = dac_windows(wav, sr)[..., None]       # (n_win, W, 1)
        embs = [np.asarray(self._fn(self.variables, w[None]))[0]
                for w in wins]
        return np.concatenate(embs, axis=0)
