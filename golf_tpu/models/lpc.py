"""Frame-wise LPC synthesis helpers (reference ``models/lpc.py:19-131``).

Stateless windowed overlap-add synthesis from per-frame LPC (or biquad
cascade) coefficients. TPU-first realisation: the per-frame constant-
coefficient IIR batches over B*frames through :func:`allpole_const`
(Pallas/blocked-scan backed), and the conv_transpose-against-diag(window)
OLA of the reference is the reshape-accumulate form in
:func:`_overlap_add` (strided conv_transpose is compile-pathological on
this toolchain; see docs/TPU_NOTES.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.allpole import allpole_const, lpc_synthesis
from ..ops.dsp import get_window_fn
from .filters import _overlap_add, _unfold

__all__ = ["LPCSynth", "BatchLPCSynth", "BatchSecondOrderLPCSynth"]


class LPCSynth:
    """Single-sequence frame-wise LPC synthesis (reference
    ``models/lpc.py:19-57``): unfold the excitation into overlapping
    windows, run a constant-coefficient all-pole per frame, windowed
    overlap-add with windowed-ones normalization.
    """

    def __init__(self, hop_length: int, window_size: int | None = None,
                 window: str = "hann"):
        self.hop_length = hop_length
        self.window_size = (hop_length * 4 if window_size is None
                            else window_size)
        self.padding = (self.window_size - self.hop_length) // 2
        self._win = jnp.asarray(get_window_fn(window)(self.window_size),
                                jnp.float32)

    def _frames(self, ex: jax.Array, n_frames: int) -> jax.Array:
        """Pad + unfold (B, T) -> (B, F, window); F capped at n_frames."""
        exp = jnp.pad(ex, ((0, 0), (self.padding, self.padding)))
        unfolded = _unfold(exp, self.window_size, self.hop_length)
        return unfolded[:, :min(unfolded.shape[1], n_frames)]

    def _ola(self, filtered: jax.Array) -> jax.Array:
        y, norm = _overlap_add(filtered, self._win, self.hop_length,
                               self.padding)
        return y / norm

    def __call__(self, ex: jax.Array, lpc: jax.Array) -> jax.Array:
        """ex: (T,); lpc: (F, 1 + order) with gain in column 0."""
        assert ex.ndim == 1 and lpc.ndim == 2
        unfolded = self._frames(ex[None], lpc.shape[0])
        assert unfolded.shape[1] == lpc.shape[0], \
            f"{unfolded.shape} != {lpc.shape}"
        gain, a = lpc[:, 0], lpc[:, 1:]
        filtered = lpc_synthesis(unfolded[0], gain, a)
        return self._ola(filtered[None])[0]


class BatchLPCSynth(LPCSynth):
    """Batched variant (reference ``models/lpc.py:60-91``)."""

    def __call__(self, ex: jax.Array, gain: jax.Array,
                 a: jax.Array) -> jax.Array:
        """ex: (B, T); gain: (B, F); a: (B, F, order)."""
        assert ex.ndim == 2 and gain.ndim == 2 and a.ndim == 3
        assert a.shape[1] == gain.shape[1]
        unfolded = self._frames(ex, a.shape[1])
        batch, frames, ws = unfolded.shape
        filtered = lpc_synthesis(
            unfolded.reshape(-1, ws),
            gain[:, :frames].reshape(-1),
            a[:, :frames].reshape(-1, a.shape[-1]))
        return self._ola(filtered.reshape(batch, frames, ws))


class BatchSecondOrderLPCSynth(LPCSynth):
    """Cascade-of-biquads frame synthesis (reference
    ``models/lpc.py:94-131``): per frame, the gain-scaled excitation runs
    through each second-order section in turn, then windowed OLA.

    biquads: (B, F, K, 3) with each section ``[1, a1, a2]``.
    """

    def __call__(self, ex: jax.Array, gain: jax.Array,
                 biquads: jax.Array) -> jax.Array:
        assert ex.ndim == 2 and gain.ndim == 2
        assert biquads.ndim == 4 and biquads.shape[-1] == 3
        unfolded = self._frames(ex, biquads.shape[1])
        batch, frames, ws = unfolded.shape
        flat = unfolded.reshape(-1, ws) \
            * gain[:, :frames].reshape(-1)[:, None]
        bi = biquads[:, :frames].reshape(-1, biquads.shape[-2], 3)
        bi = bi / bi[..., :1]  # normalise a0 like torchaudio lfilter
        for i in range(bi.shape[-2]):
            flat = allpole_const(flat, bi[:, i, 1:])
        return self._ola(flat.reshape(batch, frames, ws))
