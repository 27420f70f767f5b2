"""Round-2 additions: BatchSecondOrderLPCSynth, time-domain Taylor MLSA,
eval straggler handling (no dropped samples)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.core.sig import Sig

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# BatchSecondOrderLPCSynth (reference models/lpc.py:94-131)
# ---------------------------------------------------------------------------

def _random_biquads(b, f, k):
    # stable biquads from polar poles
    r = RNG.uniform(0.1, 0.9, (b, f, k))
    th = RNG.uniform(0.1, np.pi - 0.1, (b, f, k))
    a1 = (-2 * r * np.cos(th)).astype(np.float32)
    a2 = (r * r).astype(np.float32)
    ones = np.ones_like(a1)
    return np.stack([ones, a1, a2], axis=-1)  # (B, F, K, 3)


@pytest.mark.slow
def test_second_order_lpc_synth_matches_direct_form():
    from golf_tpu.models.lpc import BatchLPCSynth, BatchSecondOrderLPCSynth
    from golf_tpu.ops.dsp import coeff_product

    b, t, hop, k = 2, 1920, 240, 3
    synth2 = BatchSecondOrderLPCSynth(hop_length=hop)
    synth1 = BatchLPCSynth(hop_length=hop)
    frames = t // hop
    ex = jnp.asarray(RNG.standard_normal((b, t)).astype(np.float32))
    gain = jnp.asarray(RNG.uniform(0.5, 2.0, (b, frames))
                       .astype(np.float32))
    biquads = jnp.asarray(_random_biquads(b, frames, k))

    y2 = synth2(ex, gain, biquads)
    # cascade == direct form with the product polynomial
    # coeff_product expects (N_polys, batch, 3)
    a_full = coeff_product(
        jnp.moveaxis(biquads.reshape(-1, k, 3), 1, 0)
    ).reshape(b, frames, 2 * k + 1)
    np.testing.assert_allclose(np.asarray(a_full[..., 0]), 1.0, atol=1e-5)
    y1 = synth1(ex, gain, a_full[..., 1:])
    assert y2.shape == y1.shape == (b, t)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=5e-4, rtol=1e-3)


def test_lpc_synth_single_matches_batch():
    from golf_tpu.models.lpc import BatchLPCSynth, LPCSynth
    t, hop, p = 960, 120, 4
    frames = t // hop
    synth = LPCSynth(hop_length=hop)
    bsynth = BatchLPCSynth(hop_length=hop)
    ex = jnp.asarray(RNG.standard_normal(t).astype(np.float32))
    gain = jnp.asarray(RNG.uniform(0.5, 2.0, frames).astype(np.float32))
    a = jnp.asarray((RNG.standard_normal((frames, p)) * 0.1)
                    .astype(np.float32))
    lpc = jnp.concatenate([gain[:, None], a], axis=-1)
    y = synth(ex, lpc)
    yb = bsynth(ex[None], gain[None], a[None])
    np.testing.assert_allclose(np.asarray(y), np.asarray(yb[0]), atol=1e-5)


# ---------------------------------------------------------------------------
# Time-domain (Taylor multi-stage) MLSA
# ---------------------------------------------------------------------------

def test_mlsa_multi_stage_matches_dense_convolution():
    """With time-constant mel-cepstrum the Taylor cascade is an LTI filter
    whose impulse response is exp* of the unwarped cepstrum; compare
    against dense convolution with that impulse response."""
    from golf_tpu.models.filters import LTVMLSAFilter
    from golf_tpu.ops.cepstrum import freqt

    b, t, hop, order = 1, 2400, 240, 12
    k_ord = 64
    f = LTVMLSAFilter(filter_order=order, frame_period=hop, alpha=0.46,
                      mode="multi-stage", cep_order=k_ord, taylor_order=30)
    mc_frame = (RNG.standard_normal(order + 1) * 0.2).astype(np.float32)
    frames = t // hop
    mc = Sig(jnp.asarray(np.tile(mc_frame, (b, frames, 1))), hop)
    ex = Sig(jnp.asarray(RNG.standard_normal((b, t)).astype(np.float32)), 1)

    rngs = {"params": jax.random.key(0)}
    variables = f.init(rngs, ex, mc)
    out = f.apply(variables, ex, mc)

    # dense reference: h = IFFT(exp(C(w))) over a long FFT
    c_lin = np.asarray(freqt(jnp.asarray(mc_frame), k_ord, -0.46))
    n_fft = 4096
    cw = np.fft.fft(np.concatenate([c_lin, np.zeros(n_fft - k_ord - 1)]))
    h = np.fft.ifft(np.exp(cw)).real.astype(np.float32)
    x = np.asarray(ex.data[0])
    y_ref = np.convolve(x, h)[:t]
    np.testing.assert_allclose(np.asarray(out.data[0]), y_ref,
                               atol=5e-3, rtol=1e-2)


def test_mlsa2_is_concrete_spectral_filter():
    from golf_tpu.models.filters import LTVMLSAFilter2
    b, t, hop, order = 1, 2400, 240, 12
    f = LTVMLSAFilter2(filter_order=order, frame_period=hop, alpha=0.46,
                       fft_length=512, mode="multi-stage")
    frames = t // hop
    mc = Sig(jnp.zeros((b, frames, order + 1)), hop)
    ex = Sig(jnp.asarray(RNG.standard_normal((b, t)).astype(np.float32)), 1)
    variables = f.init({"params": jax.random.key(0)}, ex, mc)
    out = f.apply(variables, ex, mc)
    # zero cepstrum => identity
    tt = out.shape[1]
    np.testing.assert_allclose(np.asarray(out.data[:, 300:tt - 300]),
                               np.asarray(ex.data[:, 300:tt - 300]),
                               atol=1e-2)


# ---------------------------------------------------------------------------
# Eval stragglers are scored, not dropped (reference ltng/ae.py:258-274)
# ---------------------------------------------------------------------------

def _tiny_task_cfg(batch_size, n_items):
    import yaml
    from golf_tpu.config.registry import load_config
    cfg = load_config("cfg/ae/synthetic.yaml")
    with open("cfg/ae/decoder/ddsp.yaml") as fh:
        dec = yaml.safe_load(fh)
    dec["decoder"]["init_args"]["harm_oscillator"]["init_args"][
        "num_harmonics"] = 8
    cfg["model"]["init_args"].update(dec)
    cfg["data"]["init_args"].update({"batch_size": batch_size,
                                     "n_items": n_items, "duration": 0.5})
    cfg["model"]["init_args"]["encoder_init_args"].update(
        {"n_fft": 256, "channels": [4], "strides": [4],
         "lstm_hidden_size": 8})
    cfg["model"]["init_args"]["criterion"]["init_args"]["n_ffts"] = [256]
    return cfg


def test_trainer_eval_scores_stragglers(tmp_path):
    from golf_tpu.tasks.cli import build_from_config
    from golf_tpu.train.loop import Trainer

    # 5 items with batch 3 -> batches of 3 and 2; on a >1-device mesh the
    # remainder must be scored through the replicated path.
    cfg = _tiny_task_cfg(batch_size=3, n_items=5)
    task, datamodule, _ = build_from_config(cfg)
    trainer = Trainer(task, run_dir=str(tmp_path), max_steps=1,
                      val_every_steps=10, log_every_steps=1)
    datamodule.setup("fit")
    state = trainer.init_state(next(iter(datamodule.train_dataloader())))
    result = trainer.test(datamodule, state)
    assert np.isfinite(result["avg_mss_loss"])
    # weighted over ALL samples: re-run with batch 5 (one full batch) and
    # check the metrics agree (same model, same data, same rng protocol
    # does not hold exactly for noise, so allow loose tolerance)
    cfg2 = _tiny_task_cfg(batch_size=5, n_items=5)
    task2, datamodule2, _ = build_from_config(cfg2)
    trainer2 = Trainer(task2, run_dir=str(tmp_path / "b"), max_steps=1,
                       val_every_steps=10, log_every_steps=1)
    datamodule2.setup("fit")
    result2 = trainer2.test(datamodule2, state)
    np.testing.assert_allclose(result["avg_mcd"], result2["avg_mcd"],
                               rtol=0.2)


# ---------------------------------------------------------------------------
# SWIPE' f0 (pysptk.swipe equivalent, reference scripts/wav2f0.py)
# ---------------------------------------------------------------------------

def test_swipe_pitch_and_voicing():
    from golf_tpu.utils.swipe import swipe
    fs = 24000
    t = np.arange(fs)/fs
    x = sum(np.sin(2*np.pi*220.0*k*t)/k for k in range(1, 11))
    x = np.concatenate([x, RNG.standard_normal(fs//2) * 1e-4])
    f0 = swipe(x, fs, hopsize=120, min=65, max=1047)
    voiced = f0[20:fs//120 - 20]
    assert np.all(voiced > 0)
    assert np.mean(np.abs(voiced - 220.0) < 220.0*0.02) > 0.95
    tail = f0[-(fs//2)//120 + 5:]
    assert np.mean(tail == 0) > 0.8  # near-silence is unvoiced
