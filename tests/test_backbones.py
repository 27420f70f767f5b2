"""Forward smoke tests for every encoder backbone and the encoder
interface (shape/finiteness contracts; reference models/{mel,unet,enc,
crepe,tspn}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from golf_tpu.core.sig import Sig


def _run(module, *args, train=False, **kwargs):
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}
    variables = module.init(rngs, *args, train=train, **kwargs)
    out, mut = module.apply(
        variables, *args, train=train,
        rngs={"noise": jax.random.key(3), "dropout": jax.random.key(4)},
        mutable=["stats", "batch_stats"], **kwargs)
    return out


B, T = 2, 4800
X = Sig(jnp.asarray(np.random.default_rng(0).standard_normal(
    (B, T)).astype(np.float32) * 0.1), 1)
F0 = Sig(jnp.full((B, T), 200.0, jnp.float32), 1)


def test_unet_encoder():
    from golf_tpu.models.unet import UNetEncoder
    enc = UNetEncoder(n_fft=256, hop_length=120, channels=(4, 8),
                      strides=(4, 4), lstm_hidden_size=16)
    out = _run(enc, X, f0=F0, train=True, out_channels=7)
    assert out.shape[0] == B and out.shape[-1] == 7
    assert out.hop == 120
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_unet_encoder_env_features():
    from golf_tpu.models.unet import UNetEncoder
    enc = UNetEncoder(n_fft=256, hop_length=120, channels=(4,),
                      strides=(4,), lstm_hidden_size=8,
                      include_env_features=True, num_harmonics=16,
                      sample_rate=24000)
    out = _run(enc, X, f0=F0, train=True, out_channels=3)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_unet_encoder_lru():
    from golf_tpu.models.unet import UNetEncoder
    enc = UNetEncoder(n_fft=256, hop_length=120, channels=(4,),
                      strides=(4,), lstm_hidden_size=16, use_lru=True)
    out = _run(enc, X, f0=F0, train=True, out_channels=5)
    assert out.shape[-1] == 5
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_unet_encoder_v2():
    from golf_tpu.models.unet import UNetEncoderV2
    enc = UNetEncoderV2(sr=24000, n_fft=256, hop_length=120,
                        channels=(4,), strides=(4,), lstm_hidden_size=8)
    out = _run(enc, X, F0, train=True, out_channels=4)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_transformer_encoder():
    from golf_tpu.models.unet import TransformerEncoderBackbone
    enc = TransformerEncoderBackbone(
        n_fft=256, hop_length=120, emb_channels=8, nhead=2,
        num_attn_layers=1, maxpool_stride=16, lstm_hidden_size=8)
    out = _run(enc, X, F0, train=True, out_channels=4)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_mel2control():
    from golf_tpu.models.mel import Mel2Control
    mels = Sig(jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, 20, 24)).astype(np.float32)), 240)
    enc = Mel2Control(in_channels=24, hidden_channels=16)
    out = _run(enc, mels, train=True, out_channels=6)
    assert out.shape == (B, 20, 6)
    assert out.hop == 240


def test_x2control():
    from golf_tpu.models.mel import X2Control
    enc = X2Control(n_fft=256, hop_length=120, hidden_channels=16)
    out = _run(enc, X, F0, train=True, out_channels=3)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_lpcframenet():
    from golf_tpu.models.mel import LPCFrameNet
    mels = Sig(jnp.ones((B, 10, 24)), 240)
    out = _run(LPCFrameNet(hidden_channels=8), mels, train=True,
               out_channels=5)
    assert out.shape == (B, 10, 5)


def test_wavenet_backbone():
    from golf_tpu.models.mel import WN
    mels = Sig(jnp.ones((B, 10, 24)), 240)
    out = _run(WN(residual_channels=8, depth=4, cycle=2), mels,
               train=True, out_channels=5)
    assert out.shape == (B, 10, 5)


def test_crepe_backbone():
    from golf_tpu.models.crepe import CREPE
    enc = CREPE(channels=(8, 8, 8, 8, 8, 8))
    out = _run(enc, X, train=True, out_channels=4)
    assert out.hop == 4 * 4 * 4 * 4 * 2 * 2
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_f0_energy_encoder():
    from golf_tpu.models.enc import F0EnergyEncoder
    enc = F0EnergyEncoder(n_fft=512, win_length=480, hop_length=120,
                          num_bands=16, lstm_hidden_size=8)
    out = _run(enc, X, F0, train=True, out_channels=4)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_tspn():
    from golf_tpu.models.tspn import TopNGenerator, TTSPNEncoder
    feat = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, 20, 32)).astype(np.float32))
    gen = TopNGenerator(num_embeddings=16, embed_size=32, top_n=4)
    v = gen.init(jax.random.key(0), feat)
    tokens = gen.apply(v, feat)
    assert tokens.shape == (B, 4, 32)
    enc = TTSPNEncoder(d_model=32, nhead=2, num_layers=1, out_channels=2)
    v2 = enc.init({"params": jax.random.key(1),
                   "dropout": jax.random.key(2)}, tokens, feat)
    out = enc.apply(v2, tokens, feat,
                    rngs={"dropout": jax.random.key(3)})
    assert out.shape == (B, 4, 2)


def test_lru_layer_matches_sequential():
    from golf_tpu.models.lru import LRU
    lru = LRU(8, 8)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 50, 8)).astype(np.float32))
    v = lru.init(jax.random.key(0), x)
    y, state = lru.apply(v, x)
    assert y.shape == (1, 50, 8)
    # sequential reference using the same params
    p = v["params"]
    lam = np.exp(-np.exp(np.asarray(p["nu_log"]))
                 + 1j * np.exp(np.asarray(p["theta_log"])))
    gamma = np.sqrt(1 - np.abs(lam) ** 2)
    Bm = np.asarray(p["B_re"]) + 1j * np.asarray(p["B_im"])
    Cm = np.asarray(p["C_re"]) + 1j * np.asarray(p["C_im"])
    D = np.asarray(p["D"])
    h = np.zeros(8, complex)
    ys = []
    xn = np.asarray(x[0])
    for tstep in range(50):
        h = lam * h + gamma * (xn[tstep] @ Bm)
        ys.append((h @ Cm).real + xn[tstep] * D)
    np.testing.assert_allclose(np.asarray(y[0]), np.stack(ys), atol=1e-4)


def test_encoder_interface_learned_f0_range():
    from golf_tpu.models.enc import VocoderParameterEncoderInterface
    from golf_tpu.models.mel import Mel2Control
    enc = VocoderParameterEncoderInterface(
        backbone=Mel2Control(in_channels=24, hidden_channels=8),
        split_sizes=((3,),), args_keys=("foo_params",),
        learn_f0=True, learn_voicing=True, f0_min=80.0, f0_max=1000.0)
    mels = Sig(jnp.asarray(np.random.default_rng(4).standard_normal(
        (B, 10, 24)).astype(np.float32) * 10), 240)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    v = enc.init(rngs, mels)
    params = enc.apply(v, mels, rngs={"dropout": jax.random.key(2)})
    assert set(params) == {"f0", "voicing_logits", "foo_params"}
    f0v = np.asarray(params["f0"].data)
    assert np.all(f0v >= 80.0) and np.all(f0v <= 1000.0)
    assert params["foo_params"][0].shape == (B, 10, 3)
