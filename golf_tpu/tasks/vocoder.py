"""DDSPVocoder task — the ISMIR23 mel-spectrogram vocoder.

Reference ``ltng/vocoder.py``: running-min/max normalized log-mel features
(``ScaledLogMelSpectrogram``), encoder -> (f0, params, voicing) ->
harmonic-plus-noise decoder; MSS + masked-L1 + log-f0-L1 + voicing-BCE
losses with detach switches; optional ``inverse_target`` excitation-domain
loss; test re-estimates f0 (host-side DIO) and scores cents MAE; predict
does 6 s / 0.3 s-overlap chunked OLA crossfade.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.sig import Sig, sig_where
from ..models.ctrl import Synth
from ..models.enc import VocoderParameterEncoderInterface, _running_minmax
from ..ops.stft import melspectrogram
from .ae import bce_with_logits, f0_log_l1, masked_l1


class ScaledLogMelSpectrogram(nn.Module):
    """Log-mel features with running min/max normalization buffers
    (reference ``ltng/vocoder.py:21-35``) — the buffers are model state and
    persist in checkpoints."""

    window: str = "hanning"
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 240
    win_length: Optional[int] = None
    n_mels: int = 80
    center: bool = True
    f_min: float = 0.0
    f_max: Optional[float] = None
    power: float = 2.0

    @nn.compact
    def __call__(self, waveform: jax.Array, train: bool = False) -> Sig:
        mel = melspectrogram(
            waveform, self.sample_rate, self.n_fft, self.hop_length,
            self.n_mels, win_length=self.win_length, window=self.window,
            f_min=self.f_min, f_max=self.f_max, power=self.power,
            center=self.center)
        mel = jnp.swapaxes(mel, -1, -2)        # (B, T, n_mels)
        log_mel = jnp.log(mel + 1e-8)
        normed = _running_minmax(self, log_mel, train, "log_mel")
        return Sig(normed, self.hop_length)


class DDSPVocoder(nn.Module):
    decoder: Synth
    encoder: VocoderParameterEncoderInterface
    feature_trsfm: ScaledLogMelSpectrogram
    criterion: Any
    sample_rate: int = 24000
    hop_length: int = 120
    detach_f0: bool = False
    detach_voicing: bool = False
    train_with_true_f0: bool = False
    l1_loss_weight: float = 0.0
    f0_loss_weight: float = 1.0
    voicing_loss_weight: float = 1.0
    inverse_target: bool = False

    def _decode(self, params: Dict[str, Any]):
        params = self.decoder.apply_ctrl(
            {k: v for k, v in params.items()
             if k.endswith("_params")}) | {
            k: v for k, v in params.items() if not k.endswith("_params")}
        return self.decoder(**params)

    def __call__(self, feats: Sig, train: bool = False):
        """feats -> (f0, x_hat, voicing) (reference :126-141)."""
        params = self.encoder(feats, train=train)
        f0 = params.pop("f0")
        params["phase"] = f0 / self.sample_rate
        voicing_logits = params.pop("voicing_logits", None)
        if voicing_logits is not None:
            params["voicing"] = Sig(jax.nn.sigmoid(voicing_logits.data),
                                    voicing_logits.hop)
        x_hat = self._decode(params)
        return f0, x_hat, params.get("voicing", None)

    def training_step(self, x: Sig, f0_in_hz: Sig,
                      train: bool = True) -> Tuple[jax.Array, Dict]:
        xd = x.data
        f0d = f0_in_hz.data
        low_res_f0 = f0d[:, ::self.hop_length]
        mask = f0d > 50
        low_res_mask = mask[:, ::self.hop_length]

        feats = self.feature_trsfm(xd, train=train)
        params = self.encoder(feats, train=train)
        f0_hat = params.pop("f0")
        voicing_logits = params.pop("voicing_logits", None)

        min_len = min(f0_hat.shape[1], low_res_f0.shape[1])
        low_res_f0 = low_res_f0[:, :min_len]
        low_res_mask = low_res_mask[:, :min_len]
        f0_hat_d = f0_hat.data[:, :min_len]

        if voicing_logits is not None:
            vl = voicing_logits.data[:, :min_len]
            voicing = jax.nn.sigmoid(
                jax.lax.stop_gradient(vl) if self.detach_voicing else vl)
        else:
            vl, voicing = None, None

        f0_dec = jax.lax.stop_gradient(f0_hat_d) if self.detach_f0 \
            else f0_hat_d
        if self.train_with_true_f0:
            phase = jnp.where(low_res_mask, low_res_f0, f0_dec) \
                / self.sample_rate
        else:
            phase = f0_dec / self.sample_rate
        params["phase"] = Sig(phase, f0_hat.hop)
        if voicing is not None:
            params["voicing"] = Sig(voicing, voicing_logits.hop)

        metrics = {}
        if self.inverse_target:
            x_hat_sig, inv_x = self._decode(
                params | {"target": Sig(xd, 1)})
            x_hat = x_hat_sig.data
            x_cmp = inv_x.data
        else:
            x_hat = self._decode(params).data
            x_cmp = xd

        t = min(x_hat.shape[-1], x_cmp.shape[-1])
        x_hat, x_cmp = x_hat[:, :t], x_cmp[:, :t]
        m = mask[:, :t].astype(x_hat.dtype)
        loss = self.criterion(x_hat, x_cmp)
        l1 = jnp.sum(m * jnp.abs(x_hat - x_cmp)) / jnp.maximum(
            jnp.sum(m), 1)
        f0_loss = f0_log_l1(f0_hat_d, low_res_f0,
                            low_res_mask.astype(f0_hat_d.dtype))
        metrics["l1_loss"] = l1
        metrics["f0_loss"] = f0_loss
        if self.l1_loss_weight > 0:
            loss = loss + l1 * self.l1_loss_weight
        if self.f0_loss_weight > 0:
            loss = loss + f0_loss * self.f0_loss_weight
        if vl is not None:
            v_loss = bce_with_logits(vl, low_res_mask.astype(vl.dtype))
            metrics["voicing_loss"] = v_loss
            if self.voicing_loss_weight > 0:
                loss = loss + v_loss
        metrics["loss"] = loss
        return loss, metrics

    def validation_step(self, x: Sig, f0_in_hz: Sig) -> Dict:
        loss, metrics = self.training_step(x, f0_in_hz, train=False)
        return metrics

    def test_forward(self, x: Sig):
        """Device part of test: resynthesize (f0 re-estimation happens
        host-side in the eval harness, reference :303-331)."""
        feats = self.feature_trsfm(x.data, train=False)
        _, x_hat, _ = self(feats)
        return x_hat

    def predict_step(self, x: Sig, f0_in_hz: Optional[Sig] = None):
        """Chunked OLA for long-form inference is orchestrated host-side
        (``chunked_ola_predict`` below); one chunk here."""
        feats = self.feature_trsfm(x.data, train=False)
        _, x_hat, _ = self(feats)
        return x_hat, None


def build_ddsp_vocoder(model_cfg: Dict) -> DDSPVocoder:
    from ..config.registry import instantiate, _listify
    from .ae import build_encoder

    decoder = instantiate(model_cfg["decoder"])
    criterion = instantiate(model_cfg["criterion"])
    split_sizes, args_keys = decoder.param_layout
    encoder = build_encoder(
        model_cfg.get("encoder_class_path",
                      "golf_tpu.models.enc.VocoderParameterEncoderInterface"),
        model_cfg.get("encoder_init_args", {}), split_sizes, args_keys)

    # argument linking (reference ``DDSPVocoderCLI``, ltng/vocoder.py:38-50)
    feat_node = dict(model_cfg.get("feature_trsfm", {}))
    feat_args = dict(feat_node.get("init_args", feat_node))
    feat_args.setdefault("sample_rate", model_cfg.get("sample_rate", 24000))
    feat_args.setdefault("hop_length", model_cfg.get("hop_length", 120))
    feat_args.setdefault("window", model_cfg.get("window", "hanning"))
    feat_args.pop("class_path", None)
    feature_trsfm = ScaledLogMelSpectrogram(**_listify(feat_args))

    return DDSPVocoder(
        decoder=decoder, encoder=encoder, feature_trsfm=feature_trsfm,
        criterion=criterion,
        sample_rate=model_cfg.get("sample_rate", 24000),
        hop_length=model_cfg.get("hop_length", 120),
        detach_f0=model_cfg.get("detach_f0", False),
        detach_voicing=model_cfg.get("detach_voicing", False),
        train_with_true_f0=model_cfg.get("train_with_true_f0", False),
        l1_loss_weight=model_cfg.get("l1_loss_weight", 0.0),
        f0_loss_weight=model_cfg.get("f0_loss_weight", 1.0),
        voicing_loss_weight=model_cfg.get("voicing_loss_weight", 1.0),
        inverse_target=model_cfg.get("inverse_target", False))


def chunked_ola_predict(apply_fn, x: np.ndarray, sample_rate: int,
                        chunk_secs: float = 6.0,
                        hop_secs: float = 5.7) -> np.ndarray:
    """Host-side 6 s / 0.3 s-overlap linear-crossfade OLA (reference
    ``DDSPVocoder.predict_step``, ltng/vocoder.py:350-383).

    apply_fn: (B, frame_length) -> (B, out_length) resynthesis callable.
    """
    frame_length = int(chunk_secs * sample_rate)
    hop_length = int(hop_secs * sample_rate)
    overlap = frame_length - hop_length

    t = x.shape[-1]
    xp = np.pad(x.reshape(-1), (0, frame_length))
    n_frames = (xp.shape[0] - frame_length) // hop_length + 1
    frames = np.stack([xp[i * hop_length: i * hop_length + frame_length]
                       for i in range(n_frames)])
    x_hat = np.asarray(apply_fn(frames))[:, :frame_length]
    if x_hat.shape[1] < frame_length:
        overlap = x_hat.shape[1] - hop_length
        frame_length = x_hat.shape[1]
    p = np.arange(overlap) / max(overlap, 1)

    ola = np.zeros(hop_length * (x_hat.shape[0] - 1) + frame_length)
    for i in range(x_hat.shape[0]):
        addon = x_hat[i].copy()
        if i:
            ola[i * hop_length: i * hop_length + overlap] *= 1 - p
            addon[:overlap] *= p
        ola[i * hop_length: i * hop_length + frame_length] += addon
    return ola[:t]


def run_vocoder_test(task, variables, datamodule, sample_rate: int,
                     hop_length: int, criterion) -> dict:
    """Reference DDSPVocoder.test_step (ltng/vocoder.py:303-331): device
    resynthesis + MSS; f0 re-estimated host-side (DIO) and scored as cents
    MAE against the dataset track."""
    import jax
    import jax.numpy as jnp
    from ..ops.dsp import freq2cent
    from ..utils import native

    datamodule.setup("test")
    loader = datamodule.test_dataloader()

    # variables as jit argument (constant-wavetable XLA pathology;
    # see models/synth.py GlottalFlowTable)
    @jax.jit
    def resynth(vs, x):
        return task.apply(
            vs, Sig(x, 1),
            rngs={"noise": jax.random.key(0), "dropout": jax.random.key(0)},
            method=lambda m, xs: m.test_forward(xs)).data

    totals = {"mss": 0.0, "f0_cents": 0.0}
    weight = 0.0
    for batch in loader:
        x, f0_in_hz = batch[:2]
        x = np.asarray(x)
        x_hat = np.asarray(resynth(variables, jnp.asarray(x)))
        t = min(x.shape[1], x_hat.shape[1])
        mss = float(criterion(jnp.asarray(x_hat[:, :t]),
                              jnp.asarray(x[:, :t])))
        f0_ref = np.asarray(f0_in_hz)[:, ::hop_length]
        f0_hats = []
        for i in range(x_hat.shape[0]):
            f0_hat, _ = native.dio(
                x_hat[i].astype(np.float64), sample_rate, f0_floor=65.0,
                frame_period=1000 * hop_length / sample_rate)
            f0_hats.append(f0_hat)
        f0_hat = np.stack(f0_hats)
        f = min(f0_hat.shape[1], f0_ref.shape[1])
        fr = np.maximum(f0_ref[:, :f], 80)
        fh = np.maximum(f0_hat[:, :f], 80)
        cents = float(np.mean(np.abs(freq2cent(fh) - freq2cent(fr))))
        n = x.shape[0]
        totals["mss"] += mss * n
        totals["f0_cents"] += cents * n
        weight += n
    return {"avg_mss_loss": totals["mss"] / weight,
            "avg_f0_loss": totals["f0_cents"] / weight}
