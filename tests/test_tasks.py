"""Task-level smoke tests: one training step per task family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.core.sig import Sig


def _rngs():
    return {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}


def _apply_rngs():
    return {"noise": jax.random.key(3), "dropout": jax.random.key(4)}


def test_ddsp_vocoder_training_step():
    from golf_tpu.tasks.vocoder import build_ddsp_vocoder
    cfg = {
        "decoder": {
            "class_path": "models.hpn.HarmonicPlusNoiseSynth",
            "init_args": {
                "harm_oscillator": {
                    "class_path": "models.synth.AdditiveSynthesizer",
                    "init_args": {"num_harmonics": 16}},
                "noise_generator": {
                    "class_path": "models.noise.StandardNormalNoise"},
                "harm_filter": {"class_path": "models.ctrl.PassThrough"},
                "noise_filter": {
                    "class_path": "models.filters.LTVZeroPhaseFIRFilter",
                    "init_args": {"window": "hanning", "n_mag": 17}},
                "end_filter": {
                    "class_path": "models.filters.LTIAcousticFilter",
                    "init_args": {"length": 16}}}},
        "criterion": {"class_path": "loss.spec.MSSLoss",
                      "init_args": {"n_ffts": [256], "window": "hanning"}},
        "encoder_init_args": {
            "learn_voicing": True,
            "backbone_type": "models.mel.Mel2Control",
            "in_channels": 24, "hidden_channels": 32},
        "feature_trsfm": {"init_args": {"n_fft": 512, "n_mels": 24,
                                        "power": 1}},
        "sample_rate": 24000, "hop_length": 120,
        "train_with_true_f0": True, "detach_f0": True,
    }
    task = build_ddsp_vocoder(cfg)
    b, t = 2, 4800
    x = Sig(jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, t)).astype(np.float32) * 0.1), 1)
    f0 = Sig(jnp.full((b, t), 200.0, jnp.float32), 1)
    variables = task.init(_rngs(), x, f0, train=True,
                          method=lambda m, *a, **k: m.training_step(*a, **k))
    (loss, metrics), _ = task.apply(
        variables, x, f0, train=True, rngs=_apply_rngs(),
        mutable=["stats", "batch_stats"],
        method=lambda m, *a, **k: m.training_step(*a, **k))
    assert np.isfinite(float(loss))
    assert {"l1_loss", "f0_loss", "voicing_loss"} <= set(metrics)


@pytest.mark.slow
def test_lpcnet_training_and_generate():
    from golf_tpu.tasks.lpcnet import build_lpcnet_vocoder
    cfg = {
        "frame_decoder": {"class_path": "models.mel.Mel2Control",
                          "init_args": {"in_channels": 24,
                                        "hidden_channels": 32}},
        "sample_decoder": {"init_args": {"quantization_channels": 64,
                                         "condition_channels": 64,
                                         "a_channels": 24,
                                         "b_channels": 8}},
        "feature_trsfm": {"init_args": {"n_fft": 512, "n_mels": 24}},
        "lpc_order": 8, "quantization_channels": 64,
        "sample_rate": 24000, "hop_length": 120, "match_lpc": True,
        "lpc_frame_length": 256,
    }
    task = build_lpcnet_vocoder(cfg)
    b, t = 2, 1200
    x = Sig(jnp.asarray(np.random.default_rng(1).standard_normal(
        (b, t)).astype(np.float32) * 0.1), 1)
    f0 = Sig(jnp.full((b, t), 200.0, jnp.float32), 1)
    variables = task.init(_rngs(), x, f0, train=True,
                          method=lambda m, *a, **k: m.training_step(*a, **k))
    (loss, metrics), _ = task.apply(
        variables, x, f0, train=True, rngs=_apply_rngs(),
        mutable=["stats", "batch_stats"],
        method=lambda m, *a, **k: m.training_step(*a, **k))
    assert np.isfinite(float(loss))
    assert "ll" in metrics and "lar_l2" in metrics

    # autoregressive generation (short)
    xs = Sig(x.data[:1, :600], 1)
    y = task.apply(variables, xs, rngs=_apply_rngs(),
                   method=lambda m, *a, **k: m.generate(*a, **k))
    assert y.shape[0] == 1 and np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow
def test_lpcnet_test_protocol():
    """run_lpcnet_test: teacher-forced metrics + AR-MSS over a datamodule
    (reference ``ltng/lpcnet.py:285-330`` test protocol)."""
    from golf_tpu.tasks.data import Synthetic
    from golf_tpu.tasks.lpcnet import build_lpcnet_vocoder, run_lpcnet_test
    cfg = {
        "frame_decoder": {"class_path": "models.mel.Mel2Control",
                          "init_args": {"in_channels": 24,
                                        "hidden_channels": 32}},
        "sample_decoder": {"init_args": {"quantization_channels": 64,
                                         "condition_channels": 64,
                                         "a_channels": 24, "b_channels": 8}},
        "feature_trsfm": {"init_args": {"n_fft": 512, "n_mels": 24}},
        "lpc_order": 8, "quantization_channels": 64,
        "sample_rate": 24000, "hop_length": 120, "match_lpc": True,
        "lpc_frame_length": 256,
    }
    task = build_lpcnet_vocoder(cfg)
    dm = Synthetic(batch_size=2, duration=0.2, n_items=8)
    dm.setup("test")
    xb, f0b = next(iter(dm.test_dataloader()))
    variables = task.init(
        _rngs(), Sig(jnp.asarray(xb), 1), Sig(jnp.asarray(f0b), 1),
        train=True, method=lambda m, *a, **k: m.training_step(*a, **k))
    out = run_lpcnet_test(task, variables, dm, max_ar_batches=1)
    assert {"avg_loss", "avg_ll", "avg_ar_mss"} <= set(out)
    assert all(np.isfinite(v) for v in out.values()), out


def test_world_baseline_roundtrip():
    from golf_tpu.loss.spec import MSSLoss
    from golf_tpu.tasks.world_ae import WORLDAutoEncoder
    sr = 24000
    t = np.arange(sr) / sr
    f0c = 180.0
    x = (np.sin(2 * np.pi * f0c * t) * 0.4).astype(np.float64)
    task = WORLDAutoEncoder(sample_rate=sr, hop_length=120,
                            criterion=MSSLoss(n_ffts=(512,),
                                              window="hanning"))
    f0 = np.full(sr // 120 + 1, f0c)
    y, params = task(x, f0, sr, 1000 * 120 / sr)
    assert np.all(np.isfinite(y))
    # resynthesized tone keeps the fundamental: dominant bin near 180 Hz
    spec = np.abs(np.fft.rfft(y[2000:18000] * np.hanning(16000)))
    peak_hz = np.argmax(spec) * sr / 16000
    assert abs(peak_hz - f0c) < 10, peak_hz


def test_synthetic_datamodule():
    from golf_tpu.tasks.data import Synthetic
    dm = Synthetic(batch_size=4, n_items=8, duration=0.5)
    dm.setup("fit")
    loader = dm.train_dataloader()
    x, f0 = next(iter(loader))
    assert x.shape == (4, 12000)
    assert f0.shape == (4, 12000)
    assert np.all((f0 == 0) | (f0 > 50))


def test_trainer_smoke(tmp_path):
    from golf_tpu.config.registry import load_config
    from golf_tpu.tasks.cli import build_from_config
    from golf_tpu.train.loop import Trainer
    import yaml
    cfg = load_config("cfg/ae/synthetic.yaml")
    with open("cfg/ae/decoder/ddsp.yaml") as f:
        dec = yaml.safe_load(f)
    dec["decoder"]["init_args"]["harm_oscillator"]["init_args"][
        "num_harmonics"] = 8
    cfg["model"]["init_args"].update(dec)
    cfg["data"]["init_args"].update({"batch_size": 2, "n_items": 4,
                                     "duration": 0.5})
    cfg["model"]["init_args"]["encoder_init_args"].update(
        {"n_fft": 256, "channels": [4], "strides": [4],
         "lstm_hidden_size": 8})
    cfg["model"]["init_args"]["criterion"]["init_args"]["n_ffts"] = [256]
    task, datamodule, _ = build_from_config(cfg)
    trainer = Trainer(task, run_dir=str(tmp_path), max_steps=2,
                      val_every_steps=2, log_every_steps=1)
    state = trainer.fit(datamodule)
    assert state.step == 2
    assert (tmp_path / "ckpt" / "last").exists()
    # resume from checkpoint
    trainer2 = Trainer(task, run_dir=str(tmp_path), max_steps=3,
                       val_every_steps=10, log_every_steps=1)
    state2 = trainer2.fit(datamodule,
                          ckpt_path=str(tmp_path / "ckpt" / "last"))
    assert state2.step == 3


def test_vocoder_chunked_ola_predict():
    """Host-side 6s/0.3s-overlap OLA (reference ltng/vocoder.py:350-383):
    with an identity resynthesis, OLA must reconstruct the input."""
    from golf_tpu.tasks.vocoder import chunked_ola_predict
    rng = np.random.default_rng(0)
    sr = 1000
    x = rng.standard_normal(int(sr * 14.2)).astype(np.float32)
    out = chunked_ola_predict(lambda frames: frames, x, sr,
                              chunk_secs=6.0, hop_secs=5.7)
    assert out.shape == x.shape
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_trainer_test_metrics(tmp_path):
    """Trainer.test computes avg_mss_loss + avg_mcd (reference
    ltng/ae.py:221-274)."""
    import yaml
    from golf_tpu.config.registry import load_config
    from golf_tpu.tasks.cli import build_from_config
    from golf_tpu.train.loop import Trainer
    cfg = load_config("cfg/ae/synthetic.yaml")
    with open("cfg/ae/decoder/ddsp.yaml") as f:
        dec = yaml.safe_load(f)
    dec["decoder"]["init_args"]["harm_oscillator"]["init_args"][
        "num_harmonics"] = 8
    cfg["model"]["init_args"].update(dec)
    cfg["data"]["init_args"].update({"batch_size": 2, "n_items": 8,
                                     "duration": 0.5})
    cfg["model"]["init_args"]["encoder_init_args"].update(
        {"n_fft": 256, "channels": [4], "strides": [4],
         "lstm_hidden_size": 8})
    cfg["model"]["init_args"]["criterion"]["init_args"]["n_ffts"] = [256]
    task, datamodule, _ = build_from_config(cfg)
    trainer = Trainer(task, run_dir=str(tmp_path), max_steps=1,
                      val_every_steps=10, log_every_steps=1)
    datamodule.setup("fit")
    state = trainer.init_state(next(iter(datamodule.train_dataloader())))
    result = trainer.test(datamodule, state)
    assert np.isfinite(result["avg_mss_loss"])
    assert np.isfinite(result["avg_mcd"]) and result["avg_mcd"] > 0
