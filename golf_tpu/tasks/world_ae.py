"""WORLD analysis-synthesis baseline (non-trainable).

Reference ``ltng/world_ae.py``: pyworld CheapTrick + D4C + synthesize with
the same test/predict metric surface (MSS + MCD) so it is drop-in
comparable via ``cfg/ae/pyworld.yaml``. Analysis/synthesis runs host-side
(numpy / native C++ worldlite); metrics run on device.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.sig import Sig
from ..ops.cepstrum import mcep
from ..ops.stft import spectrogram
from ..utils import world_lite


class WORLDAutoEncoder:
    def __init__(self, sample_rate: int = 24000, hop_length: int = 240,
                 criterion: Optional[Any] = None):
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.criterion = criterion

    def forward(self, x: np.ndarray, f0: np.ndarray, fs: int,
                frame_period: float = 5.0):
        t = np.arange(f0.shape[0]) * frame_period / 1000
        sp = world_lite.cheaptrick(x, f0, t, fs)
        ap = world_lite.d4c(x, f0, t, fs)
        y = world_lite.synthesize(f0, sp, ap, fs, frame_period)
        return y, {"sp": sp, "ap": ap, "f0": f0}

    __call__ = forward

    def test_step(self, x: np.ndarray, f0_in_hz: np.ndarray) -> Dict:
        f0 = f0_in_hz[:, ::self.hop_length]
        frame_period = 1000 * self.hop_length / self.sample_rate
        x_hat = np.stack([
            self(np.asarray(xi, np.float64), np.asarray(f0i, np.float64),
                 self.sample_rate, frame_period)[0][:x.shape[1]]
            for xi, f0i in zip(x, f0)])
        t = min(x.shape[1], x_hat.shape[1])
        loss = float(self.criterion(jnp.asarray(x_hat[:, :t]),
                                    jnp.asarray(x[:, :t])))
        hop = self.sample_rate // 200

        def mceps(sig):
            amp = spectrogram(jnp.asarray(sig), 512, hop, win_length=512,
                              window="hanning", power=1.0, center=True)
            return mcep(jnp.swapaxes(amp, 1, 2), 34, alpha=0.46)

        mc_x = mceps(x[:, :t])
        mc_y = mceps(x_hat[:, :t])
        f = min(mc_x.shape[1], mc_y.shape[1])
        mcd = float(10 * math.sqrt(2) / math.log(10) * jnp.mean(
            jnp.linalg.norm(mc_x[:, :f] - mc_y[:, :f], axis=-1)))
        return {"loss": loss, "mcd": mcd, "N": x.shape[0]}

    def predict_step(self, x: np.ndarray, f0_in_hz: np.ndarray):
        assert x.shape[0] == 1
        f0 = f0_in_hz[0, ::self.hop_length]
        frame_period = 1000 * self.hop_length / self.sample_rate
        y, params = self(np.asarray(x[0], np.float64),
                         np.asarray(f0, np.float64),
                         self.sample_rate, frame_period)
        return y[None].astype(np.float32), params

    def run_test(self, datamodule) -> Dict:
        datamodule.setup("test")
        totals: Dict[str, float] = {}
        weights = 0.0
        for batch in datamodule.test_dataloader():
            x, f0 = batch[:2]
            out = self.test_step(np.asarray(x), np.asarray(f0))
            n = out.pop("N")
            for k, v in out.items():
                totals[k] = totals.get(k, 0.0) + v * n
            weights += n
        return {("avg_" + ("mss_loss" if k == "loss" else k)): v / weights
                for k, v in totals.items()}
