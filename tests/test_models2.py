"""Smoke coverage for the remaining oscillator/ctrl variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.core.sig import Sig


def _run(module, *args, method=None, **kwargs):
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = module.init(rngs, *args, method=method, **kwargs)
    return module.apply(variables, *args, method=method,
                        rngs={"noise": jax.random.key(2)}, **kwargs)


def test_weighted_glottal_table():
    from golf_tpu.models.synth import WeightedGlottalFlowTable
    osc = WeightedGlottalFlowTable(table_size=8, points=64, lf_v2=True)
    assert osc.split_sizes == (8,)
    b, t, hop = 1, 960, 96
    phase = Sig(jnp.full((b, t), 0.01), 1)
    w = Sig(jax.nn.softmax(jnp.zeros((b, t // hop, 8)), axis=-1), hop)
    out = _run(osc, phase, w)
    assert out.shape[0] == b
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_downsampled_weighted_glottal_table():
    from golf_tpu.models.synth import DownsampledWeightedGlottalFlowTable
    osc = DownsampledWeightedGlottalFlowTable(
        hop_rate=10, in_channels=8, table_size=8, points=64, lf_v2=True)
    assert osc.split_sizes == (8,)
    b, t, hop = 1, 960, 96
    h = Sig(jnp.zeros((b, t // hop, 8)), hop)

    def body(mdl, phase, h):
        (w,) = mdl.ctrl(h)
        assert w.hop == hop * 10
        return mdl(phase, w)

    phase = Sig(jnp.full((b, t), 0.01), 1)
    out = _run(osc, phase, h, method=body)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_wrapped_phase_table():
    from golf_tpu.models.synth import \
        WrappedPhaseDownsampledIndexedGlottalFlowTable
    osc = WrappedPhaseDownsampledIndexedGlottalFlowTable(
        hop_rate=10, in_channels=8, table_size=8, points=64, lf_v2=True)
    b, t = 1, 960
    wrapped = Sig(jnp.asarray((np.arange(t) * 0.01 % 1.0)
                              .astype(np.float32))[None], 1)
    w = Sig(jnp.full((b, t // 960 + 1), 0.5), 960)
    out = _run(osc, wrapped, w)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_v1_additive_normalized():
    from golf_tpu.models.synth import V1AdditiveSynthesizer
    osc = V1AdditiveSynthesizer(num_harmonics=8)
    lg = Sig(jnp.zeros((1, 5)), 96)
    logits = Sig(jnp.zeros((1, 5, 8)), 96)

    def body(mdl, lg, logits):
        return mdl.ctrl(lg, logits)

    (amp,) = _run(osc, lg, logits, method=body)
    # sigmoid amps normalized to sum 1, times exp(0)=1
    np.testing.assert_allclose(np.asarray(amp.data.sum(-1)), 1.0,
                               rtol=1e-5)


def test_additive_pulse_train():
    from golf_tpu.models.synth import AdditivePulseTrain
    osc = AdditivePulseTrain(num_harmonics=16)
    phase = Sig(jnp.full((1, 2400), 200.0 / 24000.0), 1)
    out = _run(osc, phase)
    d = np.asarray(out.data[0])
    assert np.all(np.isfinite(d))
    # periodic with period sr/f0 = 120 samples
    seg = d[240:2160]
    corr = np.corrcoef(seg[:-120], seg[120:])[0, 1]
    assert corr > 0.99


def test_ap_zero_phase_ctrl():
    from golf_tpu.models.filters import LTVAPZeroPhaseFIRFilter
    f = LTVAPZeroPhaseFIRFilter(window="hanning", n_mag=17)
    x = Sig(jnp.zeros((1, 5, 17)), 96)

    def body(mdl, x):
        return mdl.ctrl(x)

    (out,) = _run(f, x, method=body)
    # log(sigmoid(0) * sqrt(32)) = log(0.5*sqrt(32))
    np.testing.assert_allclose(np.asarray(out.data),
                               np.log(0.5 * np.sqrt(32.0)), rtol=1e-5)


def test_convert2samplewise_rewriter():
    from golf_tpu.config.registry import (convert2samplewise, load_config,
                                          instantiate)
    cfg = load_config("cfg/ae/decoder/golf.yaml")
    cfg = convert2samplewise(cfg)
    ef = cfg["decoder"]["init_args"]["end_filter"]
    assert ef["class_path"].endswith("LTVMinimumPhaseFilterPrecise")
    assert "window_length" not in ef["init_args"]
    nf = cfg["decoder"]["init_args"]["noise_filter"]
    assert nf["class_path"].endswith("LTVZeroPhaseFIRFilterPrecise")
    decoder = instantiate(cfg["decoder"])  # must build
    sizes, keys = decoder.param_layout
    assert sizes == ((64,), (), (256,), (1, 22), ())


def test_ltv_minphase_filter_non_centred():
    from golf_tpu.models.filters import LTVMinimumPhaseFilter
    from golf_tpu.ops.dsp import rc2lpc
    rng = np.random.default_rng(0)
    b, t, hop, p = 1, 960, 96, 4
    f = LTVMinimumPhaseFilter(window="hanning", window_length=192,
                              lpc_order=p, centred=False)
    ex = Sig(jnp.asarray(rng.standard_normal((b, t)).astype(np.float32)), 1)
    gain = Sig(jnp.ones((b, t // hop)), hop)
    a = Sig(jnp.asarray(rc2lpc(jnp.tanh(jnp.asarray(rng.standard_normal(
        (b, t // hop, p)).astype(np.float32) * 0.2)))), hop)
    out = _run(f, ex, gain, a)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_sign_flip_and_uniform_via_config():
    from golf_tpu.config.registry import instantiate
    for cp in ("models.noise.UniformNoise", "models.noise.SignFlipNoise"):
        mod = instantiate({"class_path": cp})
        ref = Sig(jnp.zeros((2, 100)), 1)
        out = _run(mod, ref)
        assert out.shape == (2, 100)
