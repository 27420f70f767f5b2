import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from golf_tpu.ops.allpole import allpole_scan
from golf_tpu.parallel.mesh import make_mesh
from golf_tpu.parallel.timeshard import allpole_timesharded


def _smooth_coeffs(rng, b, t, p, scale=0.3):
    from golf_tpu.ops.dsp import rc2lpc
    hop = 32
    frames = t // hop + 2
    rc_f = np.tanh(rng.standard_normal((b, frames, p)) * scale)
    up = np.stack([
        np.stack([np.interp(np.arange(t) / hop, np.arange(frames),
                            rc_f[bi, :, j]) for j in range(p)], -1)
        for bi in range(b)])
    return np.asarray(rc2lpc(jnp.asarray(up))).astype(np.float32)


def test_timesharded_matches_scan():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(data=1, time=8)
    rng = np.random.default_rng(0)
    b, t, p = 2, 2048, 6
    x = rng.standard_normal((b, t)).astype(np.float32) * 0.3
    a = _smooth_coeffs(rng, b, t, p)
    y = allpole_timesharded(jnp.asarray(x), jnp.asarray(a), mesh)
    y_ref = allpole_scan(jnp.asarray(x), jnp.asarray(a))
    scale = np.abs(np.asarray(y_ref)).max() + 1e-9
    assert np.abs(np.asarray(y) - np.asarray(y_ref)).max() / scale < 1e-3


def test_data_parallel_train_step_8dev():
    """Full training step jitted over an 8-device data mesh (SURVEY §2.5)."""
    import flax
    from golf_tpu.core.sig import Sig
    from golf_tpu.tasks.ae import build_voice_autoencoder
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=8, time=1)
    model_cfg = {
        "decoder": {
            "class_path": "models.hpn.HarmonicPlusNoiseSynth",
            "init_args": {
                "harm_oscillator": {
                    "class_path": "models.synth.AdditiveSynthesizer",
                    "init_args": {"num_harmonics": 8}},
                "noise_generator": {
                    "class_path": "models.noise.StandardNormalNoise"},
                "harm_filter": {"class_path": "models.ctrl.PassThrough"},
                "noise_filter": {
                    "class_path": "models.filters.LTVZeroPhaseFIRFilter",
                    "init_args": {"window": "hanning", "n_mag": 9}},
                "end_filter": {
                    "class_path": "models.filters.LTIAcousticFilter",
                    "init_args": {"length": 16}},
            }},
        "criterion": {"class_path": "loss.spec.MSSLoss",
                      "init_args": {"n_ffts": [128], "alpha": 1.0,
                                    "window": "hanning"}},
        "encoder_init_args": {
            "backbone_type": "models.unet.UNetEncoder",
            "n_fft": 128, "hop_length": 64, "channels": [4], "strides": [4],
            "lstm_hidden_size": 8, "num_layers": 1,
            "learn_voicing": False, "learn_f0": False},
        "sample_rate": 24000,
        "train_with_true_f0": True,
    }
    task = build_voice_autoencoder(model_cfg)
    b, t = 8, 1024
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, t)).astype(np.float32) * 0.1)
    f0 = jnp.full((b, t), 200.0, jnp.float32)
    variables = task.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        Sig(x, 1), Sig(f0, 1), train=False,
        method=lambda m, *a, **k: m.training_step(*a, **k))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    @jax.jit
    def step(params, x, f0, key):
        def loss_fn(p):
            out, _ = task.apply(
                {**variables, "params": p}, Sig(x, 1), Sig(f0, 1),
                train=True,
                rngs={"noise": key, "dropout": key},
                mutable=["stats", "batch_stats"],
                method=lambda m, *a, **k: m.training_step(*a, **k))
            return out[0]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    params = jax.device_put(variables["params"], repl)
    xs = jax.device_put(x, data)
    f0s = jax.device_put(f0, data)
    loss, grads = step(params, xs, f0s, jax.random.key(3))
    assert np.isfinite(float(loss))
    # grads are replicated (all-reduced over data axis by XLA)
    leaf = jax.tree_util.tree_leaves(grads)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_timesharded_gradients_match_scan():
    """Adjoint of the time-sharded filter == autodiff through the scan."""
    mesh = make_mesh(data=1, time=8)
    rng = np.random.default_rng(3)
    b, t, p = 1, 1024, 4
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.3)
    a = jnp.asarray(_smooth_coeffs(rng, b, t, p, scale=0.2))
    w = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))

    def loss_sharded(x, a):
        return jnp.sum(allpole_timesharded(x, a, mesh) * w)

    def loss_scan(x, a):
        return jnp.sum(allpole_scan(x, a) * w)

    gx_s, ga_s = jax.grad(loss_sharded, argnums=(0, 1))(x, a)
    gx_r, ga_r = jax.grad(loss_scan, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ga_s), np.asarray(ga_r),
                               rtol=2e-3, atol=2e-4)
