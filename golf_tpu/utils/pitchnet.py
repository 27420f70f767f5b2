"""Inference helper for the shipped neural pitch estimator.

``predict(x, sr)`` mirrors the reference's penn usage in
``scripts/wav2f0.py`` (hop 5 ms, periodicity>0.065 gating); weights are
loaded from ``golf_tpu/assets/pitchnet.msgpack`` (trained in-image by
``tools/train_pitchnet.py`` — see that file's header for provenance).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

ASSET = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "pitchnet.msgpack")

_CACHE = {}


def load_params(path: Optional[str] = None):
    import jax.numpy as jnp
    from flax import serialization
    from ..models.pitchnet import PitchNet, FRAME

    path = path or ASSET
    if path in _CACHE:
        return _CACHE[path]
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"pitchnet weights not found at {path}; train them with "
            "tools/train_pitchnet.py (no pretrained penn weights can "
            "enter this image)")
    import jax
    model = PitchNet()
    tmpl = model.init(jax.random.key(0), jnp.zeros((1, FRAME)))
    with open(path, "rb") as fh:
        params = serialization.from_bytes(tmpl, fh.read())
    # weights are stored bf16 to keep the asset small; run in fp32
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    _CACHE[path] = (model, params)
    return model, params


def predict(x: np.ndarray, sr: int, hop_ms: float = 5.0,
            gate: float = 0.065, weights: Optional[str] = None,
            batch: int = 512) -> Tuple[np.ndarray, np.ndarray]:
    """Waveform → (f0 (n_frames,), periodicity). f0=0 where unvoiced."""
    import jax
    import jax.numpy as jnp
    from ..models.pitchnet import frame_signal, decode

    model, params = load_params(weights)
    frames, n = frame_signal(np.asarray(x, np.float64), sr, hop_ms)
    fwd = jax.jit(lambda p, f: model.apply(p, f))
    f0s, pers = [], []
    # fixed batch size -> one compiled shape
    pad_to = ((n + batch - 1) // batch) * batch
    frames = np.pad(frames, ((0, pad_to - n), (0, 0)))
    for i in range(0, pad_to, batch):
        logits = fwd(params, jnp.asarray(frames[i:i + batch]))
        f0, per = decode(logits, gate)
        f0s.append(np.asarray(f0))
        pers.append(np.asarray(per))
    return np.concatenate(f0s)[:n], np.concatenate(pers)[:n]
