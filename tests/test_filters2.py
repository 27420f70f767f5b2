"""Coverage for the remaining filter variants (MLSA / cepstral / PQMF /
∇WORLD / radiation / min-phase FIR / AP) and noise band + loss variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.core.sig import Sig


def _run(module, *args, **kwargs):
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = module.init(rngs, *args, **kwargs)
    return module.apply(variables, *args,
                        rngs={"noise": jax.random.key(2)}, **kwargs)


RNG = np.random.default_rng(0)
B, T, HOP = 1, 2400, 240
FRAMES = T // HOP
EX = Sig(jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32)), 1)


def test_mlsa_filter_freq_domain():
    from golf_tpu.models.filters import LTVMLSAFilter
    f = LTVMLSAFilter(filter_order=12, frame_period=HOP, alpha=0.46,
                      fft_length=512, phase="minimum")
    mc = Sig(jnp.asarray(RNG.standard_normal(
        (B, FRAMES, 13)).astype(np.float32) * 0.1), HOP)
    out = _run(f, EX, mc)
    assert out.ndim == 2
    assert np.all(np.isfinite(np.asarray(out.data)))
    # zero cepstrum => H == 1 => output ~ input
    mc0 = Sig(jnp.zeros((B, FRAMES, 13)), HOP)
    out0 = _run(f, EX, mc0)
    t = out0.shape[1]
    np.testing.assert_allclose(np.asarray(out0.data[:, 300:t - 300]),
                               np.asarray(EX.data[:, 300:t - 300]),
                               atol=1e-2)


def test_mlsa_filter_taylor_mode():
    from golf_tpu.models.filters import LTVMLSAFilter
    f = LTVMLSAFilter(filter_order=12, frame_period=HOP, alpha=0.46,
                      mode="multi-stage", cep_order=64, fft_length=512)
    mc = Sig(jnp.asarray(RNG.standard_normal(
        (B, FRAMES, 13)).astype(np.float32) * 0.1), HOP)
    out = _run(f, EX, mc)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_cep_filter_zero_and_min_phase():
    from golf_tpu.models.filters import LTVCepFilter
    for phase in ("zero", "min"):
        f = LTVCepFilter(filter_order=24, n_fft=256, hop_length=64,
                         phase=phase)
        ceps = Sig(jnp.asarray(RNG.standard_normal(
            (B, T // 64, 25)).astype(np.float32) * 0.05), 64)
        out = _run(f, EX, ceps)
        assert np.all(np.isfinite(np.asarray(out.data)))


def test_ap_filter():
    from golf_tpu.models.filters import LTVAPFilter
    f = LTVAPFilter(n_mag=65, filter_order=12, frame_period=HOP,
                    fft_length=512)
    x = Sig(jnp.asarray(RNG.standard_normal(
        (B, FRAMES, 65)).astype(np.float32)), HOP)
    # ctrl converts raw logits -> mcep
    variables = f.init({"params": jax.random.key(0)}, EX,
                       Sig(jnp.zeros((B, FRAMES, 13)), HOP))
    (mc,) = f.apply(variables, x, method=lambda m, a: m.ctrl(a))
    assert mc.shape == (B, FRAMES, 13)
    out = f.apply(variables, EX, mc)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_diffworld_sp_filter():
    from golf_tpu.models.filters import DiffWorldSPFilter
    f = DiffWorldSPFilter(n_mels=20, n_fft=256, hop_length=HOP,
                          f_min=0.0, f_max=12000.0, sample_rate=24000)
    mel = Sig(jnp.asarray(np.abs(RNG.standard_normal(
        (B, FRAMES, 20))).astype(np.float32)), HOP)
    out = _run(f, EX, mel)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_pqmf_filter():
    from golf_tpu.models.filters import LTVPQMF
    f = LTVPQMF(n_mag=4, filter_order=62)
    log_gain = Sig(jnp.zeros((B, FRAMES, 4)), HOP)
    out = _run(f, EX, log_gain)
    assert out.ndim == 2
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_radiation_filter_module():
    from golf_tpu.models.filters import LTIRadiationFilter
    f = LTIRadiationFilter(num_zeros=8)
    out = _run(f, EX)
    assert out.shape == EX.shape
    # differentiator-like: DC strongly attenuated
    dc_in = abs(np.asarray(EX.data).sum())
    spec_out = np.abs(np.fft.rfft(np.asarray(out.data[0])))
    spec_in = np.abs(np.fft.rfft(np.asarray(EX.data[0])))
    assert spec_out[0] / max(spec_in[1:100].mean(), 1e-9) < \
        spec_in[0] / max(spec_in[1:100].mean(), 1e-9) + 1.0


def test_min_phase_fir_filters():
    from golf_tpu.models.filters import (LTVMinimumPhaseFIRFilter,
                                         LTVMinimumPhaseFIRFilterPrecise)
    n_mag = 17
    lm = Sig(jnp.asarray(np.tile(RNG.standard_normal(
        (B, 1, n_mag)).astype(np.float32) * 0.3,
        (1, FRAMES + 1, 1))), HOP)
    fast = LTVMinimumPhaseFIRFilter(window="hanning", n_mag=n_mag)
    precise = LTVMinimumPhaseFIRFilterPrecise(window="hanning", n_mag=n_mag)
    of = _run(fast, EX, lm)
    op = _run(precise, EX, lm)
    t = min(of.shape[1], op.shape[1])
    np.testing.assert_allclose(np.asarray(of.data[:, 64:t]),
                               np.asarray(op.data[:, 64:t]), atol=1e-3)


@pytest.mark.slow
def test_complex_conj_allpass():
    from golf_tpu.models.filters import LTIComplexConjAllpassFilter
    f = LTIComplexConjAllpassFilter(num_roots=3)
    out = _run(f, EX)
    sx = np.abs(np.fft.rfft(np.asarray(EX.data[0])))
    sy = np.abs(np.fft.rfft(np.asarray(out.data[0])))
    ratio = sy[10:-10] / np.maximum(sx[10:-10], 1e-6)
    assert np.median(np.abs(ratio - 1)) < 0.25


def test_sample_based_alias():
    from golf_tpu.models.filters import (LTVMinimumPhaseFilterPrecise,
                                         SampleBasedLTVMinimumPhaseFilter)
    assert issubclass(SampleBasedLTVMinimumPhaseFilter,
                      LTVMinimumPhaseFilterPrecise)


def test_noise_band():
    from golf_tpu.models.noise import NoiseBand
    nb = NoiseBand(n_filters=8, fs=24000)
    ref = Sig(jnp.zeros((B, T)), 1)
    log_gain = Sig(jnp.zeros((B, FRAMES, 8)), HOP)
    out = _run(nb, ref, log_gain)
    assert out.shape[0] == B
    assert np.all(np.isfinite(np.asarray(out.data)))
    assert float(jnp.std(out.data)) > 0


def test_mss_loss_v2_variants():
    from golf_tpu.loss.spec import MSSLossV2
    x = jnp.asarray(RNG.standard_normal((2, 2048)).astype(np.float32))
    for comp in ("log1p", "log", "id"):
        for dist in ("l1", "l2"):
            loss = MSSLossV2(n_ffts=(256,), distance=dist,
                             compression=comp)
            assert float(loss(x, x)) == 0.0
            assert float(loss(x, x * 1.1)) > 0


@pytest.mark.slow
def test_inverse_mode_excitation_domain():
    """SourceFilterSynth target mode returns (src, inverse-filtered target)
    (reference sf.py:61-63 + vocoder inverse_target)."""
    from golf_tpu.models.filters import LTVMinimumPhaseFilter
    from golf_tpu.ops.dsp import rc2lpc
    f = LTVMinimumPhaseFilter(window="hanning", window_length=2 * HOP,
                              lpc_order=4)
    gain = Sig(jnp.ones((B, FRAMES)), HOP)
    a = Sig(jnp.asarray(rc2lpc(jnp.tanh(jnp.asarray(RNG.standard_normal(
        (B, FRAMES, 4)).astype(np.float32) * 0.2)))), HOP)
    variables = f.init({"params": jax.random.key(0)}, EX, gain, a)
    y = f.apply(variables, EX, gain, a)
    src, y_ex = f.apply(variables, EX, Sig(y.data, 1), gain, a,
                        method=lambda m, *args: m.reverse(*args))
    # inverse-filtering the forward output recovers ~the gained excitation
    t0, t1 = 4 * HOP, min(src.shape[1], y_ex.shape[1]) - 4 * HOP
    corr = np.corrcoef(np.asarray(src.data[0, t0:t1]),
                       np.asarray(y_ex.data[0, t0:t1]))[0, 1]
    assert corr > 0.9, corr


def test_fft_size_policies_and_conv_parity(monkeypatch):
    """FFT size selection: smooth_fft_size minimality, fast_fft_size
    (the measured default: smallest 2^a * m, m odd part <= 45 — on-chip
    probe docs/results_r4/fft_size_probe.json), and _fft_frame_conv
    padding-invariance between the default and forced-pow2 sizes."""
    import numpy as np

    from golf_tpu.models.filters import _fft_frame_conv, _smooth_fft_size
    from golf_tpu.ops.fftsize import fast_fft_size

    for n, want in [(1, 1), (2, 2), (3, 3), (7, 8), (1199, 1200),
                    (1201, 1215), (2049, 2160), (240, 240), (730, 750)]:
        got = _smooth_fft_size(n)
        assert got == want, (n, got, want)
        assert got >= n

    for n, want in [(1, 1), (7, 8), (1199, 1280), (1281, 1440),
                    (1441, 1536), (2049, 2304), (240, 240), (730, 768)]:
        got = fast_fft_size(n)
        assert got == want, (n, got, want)
        assert got >= n
        # odd part within the measured-fast family
        m = got
        while m % 2 == 0:
            m //= 2
        assert m in (1, 3, 5, 9, 15, 45), got

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((2, 5, 960)).astype(np.float32))
    kernels = jnp.asarray(rng.standard_normal((2, 5, 240)).astype(np.float32))
    ref = np.asarray(_fft_frame_conv(frames, kernels, 240, False))
    monkeypatch.setenv("GOLF_TPU_FFT_POW2", "1")
    got = np.asarray(_fft_frame_conv(frames, kernels, 240, False))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
