"""VoiceAutoEncoder task — the Interspeech24 analysis-by-synthesis trainer.

Reference ``ltng/ae.py``: encoder -> raw param groups -> decoder ctrl
transforms -> synthesizer; MSS loss + optional f0/voicing aux losses with
>50 Hz masking; train-with-true-f0 replaces unvoiced f0 with a per-utterance
random 50-500 Hz value (``ltng/ae.py:98-101``); test computes MSS + MCD.

The task is one flax module whose step methods are pure functions — the
Trainer jits them over the device mesh.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.sig import Sig, sig_where
from ..models.ctrl import Synth
from ..models.enc import VocoderParameterEncoderInterface
from ..ops.cepstrum import mcep
from ..ops.stft import spectrogram


def masked_l1(pred: jax.Array, target: jax.Array,
              mask: jax.Array) -> jax.Array:
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.abs(pred - target) * mask) / n


def f0_log_l1(f0_hat: jax.Array, f0: jax.Array,
              mask: jax.Array) -> jax.Array:
    return masked_l1(jnp.log(f0_hat + 1e-3), jnp.log(f0 + 1e-3), mask)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class VoiceAutoEncoder(nn.Module):
    decoder: Synth
    encoder: VocoderParameterEncoderInterface
    criterion: Any
    sample_rate: int = 24000
    detach_f0: bool = False
    detach_voicing: bool = False
    train_with_true_f0: bool = True
    f0_loss_weight: float = 1.0
    voicing_loss_weight: float = 1.0
    # Sample-wise (GOLF-ss) stabilizer: penalize frame-to-frame jumps of
    # the LPC coefficients (and log-gain). The reference sidesteps ss
    # training fragility by training frame-wise then converting
    # (README.md:92-94); this regularizer makes direct/finetuned ss
    # training stable without changing the reference loss surface
    # (weight 0 = reference behavior).
    coef_smooth_weight: float = 0.0

    def _decode(self, params: Dict[str, Any],
                return_ctrl: bool = False):
        ctrl_params = self.decoder.apply_ctrl(
            {k: v for k, v in params.items()
             if k.endswith("_params")})
        merged = ctrl_params | {
            k: v for k, v in params.items() if not k.endswith("_params")}
        y = self.decoder(**merged)
        if return_ctrl:
            return y, ctrl_params
        return y

    def __call__(self, x: Optional[Sig] = None, f0: Optional[Sig] = None,
                 params: Optional[Dict[str, Any]] = None,
                 train: bool = False):
        """Full forward (reference ``ltng/ae.py:60-81``)."""
        params = {} if params is None else dict(params)
        enc_params = None
        if x is not None:
            enc_params = self.encoder(x, f0=f0, train=train)
            params.update(enc_params)
            if "phase" not in params:
                params["phase"] = params["f0"] / self.sample_rate
            params.pop("f0", None)
            voicing_logits = params.pop("voicing_logits", None)
            if voicing_logits is not None:
                params["voicing"] = Sig(
                    jax.nn.sigmoid(voicing_logits.data), voicing_logits.hop)
        y = self._decode(params)
        return y, enc_params

    def prepare_training(self, x: Sig, f0_in_hz: Sig, train: bool = True):
        """Encoder pass + phase/voicing preparation — the frame-rate (NN)
        half of the training step. Split out so the time-sharded step
        (``parallel/seqpar.py``) can run it in the GSPMD region while the
        sample-rate decode below runs under shard_map."""
        params = self.encoder(
            x, f0=f0_in_hz if self.train_with_true_f0 else None,
            train=train)
        f0_hat = params.pop("f0", None)

        if self.train_with_true_f0:
            key = self.make_rng("noise")
            random_f0 = jax.random.uniform(
                key, (f0_in_hz.shape[0], 1), minval=50.0, maxval=500.0)
            phase = sig_where(
                Sig(f0_in_hz.data == 0, f0_in_hz.hop),
                Sig(jnp.broadcast_to(random_f0, f0_in_hz.shape),
                    f0_in_hz.hop),
                f0_in_hz) / self.sample_rate
        elif self.detach_f0:
            phase = Sig(jax.lax.stop_gradient(f0_hat.data),
                        f0_hat.hop) / self.sample_rate
        else:
            phase = f0_hat / self.sample_rate
        params["phase"] = phase

        voicing_logits = params.pop("voicing_logits", None)
        if voicing_logits is not None:
            v = jax.nn.sigmoid(voicing_logits.data)
            if self.detach_voicing:
                v = jax.lax.stop_gradient(v)
            params["voicing"] = Sig(v, voicing_logits.hop)
        return params, f0_hat, voicing_logits

    def aux_losses(self, f0_hat, voicing_logits, ctrl_params,
                   f0_in_hz: Sig):
        """f0/voicing aux losses (>50 Hz masking, ``ltng/ae.py:120-140``)
        + the optional coefficient-smoothness regularizer. Returns
        (aux_total, metrics)."""
        aux = 0.0
        metrics: Dict[str, jax.Array] = {}

        if self.coef_smooth_weight > 0 and \
                "end_filter_params" in ctrl_params:
            efp = ctrl_params["end_filter_params"]
            reg = 0.0
            for sig in efp:
                d = sig.data if isinstance(sig, Sig) else sig
                # coefficient tensors only (B, F, p); the gain (B, F) is
                # exp-scaled and would dominate the penalty
                if d.ndim >= 3 and d.shape[1] > 1:
                    reg = reg + jnp.mean(
                        jnp.square(jnp.diff(d, axis=1)))
            aux = aux + self.coef_smooth_weight * reg
            metrics["coef_smooth"] = reg

        if f0_hat is not None:
            target = f0_in_hz.data[:, ::f0_hat.hop][:, : f0_hat.shape[1]]
            pred = f0_hat.data[:, : target.shape[1]]
            mask = (target > 50).astype(pred.dtype)
            f0_loss = f0_log_l1(pred, target, mask)
            aux = aux + f0_loss * self.f0_loss_weight
            metrics["f0_loss"] = f0_loss

        if voicing_logits is not None:
            vt = (f0_in_hz.data > 50).astype(jnp.float32)
            vt = vt[:, ::voicing_logits.hop][:, : voicing_logits.shape[1]]
            vl = voicing_logits.data[:, : vt.shape[1]]
            v_loss = bce_with_logits(vl, vt)
            aux = aux + v_loss * self.voicing_loss_weight
            metrics["voicing_loss"] = v_loss
        return aux, metrics

    def training_step(self, x: Sig, f0_in_hz: Sig,
                      train: bool = True) -> Tuple[jax.Array, Dict]:
        params, f0_hat, voicing_logits = self.prepare_training(
            x, f0_in_hz, train)
        x_hat, ctrl_params = self._decode(params, return_ctrl=True)
        t = min(x_hat.shape[1], x.shape[1])
        loss = self.criterion(x_hat.data[:, :t], x.data[:, :t])
        aux, metrics = self.aux_losses(f0_hat, voicing_logits,
                                       ctrl_params, f0_in_hz)
        loss = loss + aux
        metrics["loss"] = loss
        return loss, metrics

    def validation_step(self, x: Sig, f0_in_hz: Sig) -> Dict:
        if self.train_with_true_f0:
            phase = sig_where(Sig(f0_in_hz.data == 0, f0_in_hz.hop),
                              150.0, f0_in_hz) / self.sample_rate
            x_hat, enc_params = self(x, f0_in_hz, {"phase": phase})
        else:
            x_hat, enc_params = self(x)
        t = min(x_hat.shape[1], x.shape[1])
        loss = self.criterion(x_hat.data[:, :t], x.data[:, :t])
        out = {}
        if enc_params and "f0" in enc_params:
            f0_hat = enc_params["f0"]
            target = f0_in_hz.data[:, ::f0_hat.hop][:, : f0_hat.shape[1]]
            pred = f0_hat.data[:, : target.shape[1]]
            mask = (target > 50).astype(pred.dtype)
            f0_loss = f0_log_l1(pred, target, mask)
            loss = loss + f0_loss * self.f0_loss_weight
            out["f0_loss"] = f0_loss
        if enc_params and "voicing_logits" in enc_params:
            vlg = enc_params["voicing_logits"]
            vt = (f0_in_hz.data > 50).astype(jnp.float32)
            vt = vt[:, ::vlg.hop][:, : vlg.shape[1]]
            v_loss = bce_with_logits(vlg.data[:, : vt.shape[1]], vt)
            loss = loss + v_loss * self.voicing_loss_weight
            out["voicing_loss"] = v_loss
        out["loss"] = loss
        return out

    def test_step(self, x: Sig, f0_in_hz: Sig) -> Dict:
        """MSS + MCD (reference ``ltng/ae.py:221-256``): mcep order 34,
        n_fft 512, alpha 0.46, hop sr/200."""
        if self.train_with_true_f0:
            phase = sig_where(Sig(f0_in_hz.data == 0, f0_in_hz.hop),
                              150.0, f0_in_hz) / self.sample_rate
            x_hat, _ = self(x, f0_in_hz, {"phase": phase})
        else:
            x_hat, _ = self(x)
        t = min(x_hat.shape[1], x.shape[1])
        loss = self.criterion(x_hat.data[:, :t], x.data[:, :t])

        hop = self.sample_rate // 200

        def mceps(sig):
            amp = spectrogram(sig, 512, hop, win_length=512,
                              window="hanning", power=1.0, center=True)
            # n_iter=2: converged mel-cepstra (diffsptk-comparable
            # absolute MCD, not just the n_iter=0 relative estimate)
            return mcep(jnp.swapaxes(amp, 1, 2), 34, alpha=0.46, n_iter=2)

        mc_x = mceps(x.data[:, :t])
        mc_y = mceps(x_hat.data[:, :t])
        f = min(mc_x.shape[1], mc_y.shape[1])
        mcd = (10 * math.sqrt(2) / math.log(10)
               * jnp.mean(jnp.linalg.norm(mc_x[:, :f] - mc_y[:, :f],
                                          axis=-1)))
        return {"loss": loss, "mcd": mcd, "N": x.shape[0]}

    def predict_step(self, x: Sig, f0_in_hz: Sig):
        if self.train_with_true_f0:
            phase = sig_where(Sig(f0_in_hz.data == 0, f0_in_hz.hop),
                              150.0, f0_in_hz) / self.sample_rate
            return self(x, f0_in_hz, {"phase": phase})
        return self(x)


def build_encoder(encoder_class_path: str, encoder_init_args: Dict,
                  split_sizes, args_keys) -> VocoderParameterEncoderInterface:
    """Reference construction path (``ltng/ae.py:43-51`` +
    ``models/enc.py:33-71``): encoder args are split into interface args
    (learn_f0 etc.) and backbone kwargs; the backbone is built reflectively
    from ``backbone_type``."""
    from ..config.registry import import_object, _listify

    args = dict(encoder_init_args)
    iface_keys = {"learn_voicing", "learn_f0", "f0_min", "f0_max"}
    iface_args = {k: args.pop(k) for k in list(args)
                  if k in iface_keys}
    backbone_type = args.pop("backbone_type",
                             "golf_tpu.models.unet.UNetEncoder")
    backbone_cls = import_object(backbone_type)
    # reference passes sample_rate through to some backbones only
    field_names = {f.name for f in
                   backbone_cls.__dataclass_fields__.values()}
    backbone_args = {k: _listify(v) for k, v in args.items()
                     if k in field_names}
    backbone = backbone_cls(**backbone_args)

    cls = import_object(encoder_class_path)
    return cls(backbone=backbone, split_sizes=tuple(split_sizes),
               args_keys=tuple(args_keys), **iface_args)


def build_voice_autoencoder(model_cfg: Dict) -> VoiceAutoEncoder:
    """Build the task from a reference-style config subtree
    (``cfg/ae/vctk.yaml`` model.init_args)."""
    from ..config.registry import instantiate

    decoder = instantiate(model_cfg["decoder"])
    criterion = instantiate(model_cfg["criterion"])
    split_sizes, args_keys = decoder.param_layout
    encoder = build_encoder(
        model_cfg.get("encoder_class_path",
                      "golf_tpu.models.enc.VocoderParameterEncoderInterface"),
        model_cfg.get("encoder_init_args", {}), split_sizes, args_keys)
    return VoiceAutoEncoder(
        decoder=decoder, encoder=encoder, criterion=criterion,
        sample_rate=model_cfg.get("sample_rate", 24000),
        detach_f0=model_cfg.get("detach_f0", False),
        detach_voicing=model_cfg.get("detach_voicing", False),
        train_with_true_f0=model_cfg.get("train_with_true_f0", True),
        f0_loss_weight=model_cfg.get("f0_loss_weight", 1.0),
        voicing_loss_weight=model_cfg.get("voicing_loss_weight", 1.0),
        coef_smooth_weight=model_cfg.get("coef_smooth_weight", 0.0))
