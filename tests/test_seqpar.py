"""End-to-end time-axis sharding of the full synthesis chain.

The round-2 north-star deliverable (SURVEY.md §2.5): the COMPLETE GOLF-ss
training step — encoder, oscillator (phase cumsum + oversampled wavetable
+ decimation), noise + zero-phase FIR, sample-wise all-pole, LTI room
filter, MSS loss, gradients — on a (data x time) mesh, matching the
single-device step to numerical tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from golf_tpu.core.sig import Sig
from golf_tpu.parallel import seqpar
from golf_tpu.parallel.mesh import make_mesh
from golf_tpu.tasks.ae import build_voice_autoencoder


def _tiny_golf_cfg(oversampling=4, lpc_order=8):
    return {
        "decoder": {
            "class_path": "models.sf.SourceFilterSynth",
            "init_args": {
                "harm_oscillator": {
                    "class_path":
                        "models.synth.DownsampledIndexedGlottalFlowTable",
                    "init_args": {
                        "hop_rate": 10, "in_channels": 16,
                        "oversampling": oversampling, "equal_energy": True,
                        "table_type": "derivative",
                        "normalize_method": "constant_power",
                        "align_peak": True, "trainable": False,
                        "min_R_d": 0.3, "max_R_d": 2.7, "lf_v2": True,
                        "points": 128, "table_size": 16}},
                "noise_generator": {
                    "class_path": "models.noise.StandardNormalNoise"},
                "noise_filter": {
                    "class_path": "models.filters.LTVZeroPhaseFIRFilter",
                    "init_args": {"window": "hanning", "n_mag": 33}},
                "end_filter": {
                    "class_path":
                        "models.filters.LTVMinimumPhaseFilterPrecise",
                    "init_args": {"lpc_order": lpc_order,
                                  "lpc_parameterisation": "rc2lpc"}},
                "room_filter": {
                    "class_path": "models.filters.LTIAcousticFilter",
                    "init_args": {"length": 32, "conv_method": "fft"}},
                "subtract_harmonics": False,
            }},
        "criterion": {"class_path": "loss.spec.MSSLoss",
                      "init_args": {"n_ffts": [509], "alpha": 1.0,
                                    "window": "hanning"}},
        "encoder_init_args": {
            "f0_min": 60.0, "f0_max": 1000.0,
            "backbone_type": "models.unet.UNetEncoder",
            "n_fft": 256, "hop_length": 240, "channels": [4],
            "strides": [4], "lstm_hidden_size": 16, "num_layers": 1,
            "dropout": 0.0, "learn_voicing": False, "learn_f0": False},
        "sample_rate": 24000,
        "train_with_true_f0": True,
    }


def _make_inputs(b, t, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1)
    f0 = jnp.asarray(
        (200.0 + 40.0 * np.sin(np.linspace(0, 6.0, t))[None, :]
         * np.ones((b, 1))).astype(np.float32))
    return x, f0


def _init_task(task, x, f0):
    return jax.jit(lambda xs, f0s: task.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        Sig(xs, 1), Sig(f0s, 1), train=True,
        method=lambda m, *a, **k: m.training_step(*a, **k)))(x, f0)


def _unsharded_step(task, variables, x, f0, key):
    def loss_fn(p):
        out, _ = task.apply(
            {**variables, "params": p}, Sig(x, 1), Sig(f0, 1), train=True,
            rngs={"noise": key, "dropout": key},
            mutable=["stats", "batch_stats"],
            method=lambda m, *a, **k: m.training_step(*a, **k))
        return out[0], out[1]
    return jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])


@pytest.mark.parametrize("oversampling", [1, 4])
def test_seqpar_training_step_matches_single_device(oversampling):
    """Loss and gradients of the full GOLF-ss training step on an 8-way
    time mesh == the single-device step."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(data=1, time=8)
    task = build_voice_autoencoder(_tiny_golf_cfg(oversampling))
    b, t = 2, 8 * 2400
    x, f0 = _make_inputs(b, t)
    variables = _init_task(task, x, f0)
    key = jax.random.key(7)

    (loss_ref, _), grads_ref = _unsharded_step(task, variables, x, f0, key)

    step = seqpar.make_sharded_train_fn(task, mesh)
    loss_s, grads_s, metrics, _ = step(
        variables["params"], variables.get("stats", {}),
        variables.get("batch_stats", {}), x, f0, key)

    assert np.isfinite(float(loss_s))
    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=2e-4, atol=2e-5)

    flat_r, _ = jax.tree_util.tree_flatten(grads_ref)
    flat_s, _ = jax.tree_util.tree_flatten(grads_s)
    for gr, gs in zip(flat_r, flat_s):
        gr, gs = np.asarray(gr), np.asarray(gs)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gs / scale, gr / scale,
                                   rtol=5e-3, atol=5e-4)


def test_seqpar_golf_ff_ola_matches():
    """Frame-wise (GOLF-ff) end filter: per-frame constant-coefficient
    LPC + windowed OLA with spilled-edge halo exchange, parity vs the
    single-device step."""
    mesh = make_mesh(data=1, time=8)
    cfg = _tiny_golf_cfg(1)
    cfg["decoder"]["init_args"]["end_filter"] = {
        "class_path": "models.filters.LTVMinimumPhaseFilter",
        "init_args": {"lpc_order": 8, "lpc_parameterisation": "rc2lpc",
                      "window": "hanning", "window_length": 960,
                      "centred": True}}
    task = build_voice_autoencoder(cfg)
    b, t = 2, 8 * 2400
    x, f0 = _make_inputs(b, t, seed=5)
    variables = _init_task(task, x, f0)
    key = jax.random.key(11)

    (loss_ref, _), grads_ref = _unsharded_step(task, variables, x, f0, key)
    step = seqpar.make_sharded_train_fn(task, mesh)
    loss_s, grads_s, _, _ = step(
        variables["params"], variables.get("stats", {}),
        variables.get("batch_stats", {}), x, f0, key)
    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=3e-4, atol=3e-5)
    flat_r, _ = jax.tree_util.tree_flatten(grads_ref)
    flat_s, _ = jax.tree_util.tree_flatten(grads_s)
    for gr, gs in zip(flat_r, flat_s):
        gr, gs = np.asarray(gr), np.asarray(gs)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gs / scale, gr / scale,
                                   rtol=5e-3, atol=5e-4)


def test_seqpar_2d_mesh_matches_single_device():
    """(data=2) x (time=4) mesh: loss AND gradients of the full training
    step equal the single-device step. Parity holds even with a data axis
    because the encoder (incl. batch-norm statistics) runs in the GSPMD
    jit region with GLOBAL batch semantics, and the per-data-shard MSS
    means pmean to the global batch mean (equal shard sizes)."""
    mesh = make_mesh(data=2, time=4)
    task = build_voice_autoencoder(_tiny_golf_cfg(4))
    b, t = 4, 4 * 2400
    x, f0 = _make_inputs(b, t, seed=3)
    variables = _init_task(task, x, f0)
    key = jax.random.key(5)

    (loss_ref, _), grads_ref = _unsharded_step(task, variables, x, f0, key)

    step = seqpar.make_sharded_train_fn(task, mesh)
    loss, grads, metrics, _ = step(
        variables["params"], variables.get("stats", {}),
        variables.get("batch_stats", {}), x, f0, key)
    assert np.isfinite(float(loss))
    assert abs(float(loss) - float(loss_ref)) < 1e-3 * max(
        abs(float(loss_ref)), 1.0), (float(loss), float(loss_ref))
    for gr, gs in zip(jax.tree_util.tree_leaves(grads_ref),
                      jax.tree_util.tree_leaves(grads)):
        gr, gs = np.asarray(gr), np.asarray(gs)
        denom = np.max(np.abs(gr)) + 1e-12
        assert np.max(np.abs(gr - gs)) / denom < 1e-4


def test_seqpar_padded_arbitrary_length_matches():
    """Arbitrary (non-hop-aligned) T: ``pad_align`` pads inside the jitted
    step (zero audio, edge-held f0) and the result exactly equals the
    single-device step on the padded batch (VERDICT r2 weak #6)."""
    mesh = make_mesh(data=1, time=8)
    task = build_voice_autoencoder(_tiny_golf_cfg(1))
    b, t = 2, 8 * 2400 + 1234  # not divisible by n_time * hop
    x, f0 = _make_inputs(b, t, seed=9)
    variables = _init_task(task, x, f0)
    key = jax.random.key(21)

    # reference: single-device step on the padded batch
    x_pad, f0_pad, t_orig = seqpar.pad_to_alignment(x, f0, 8, 2400)
    assert t_orig == t and x_pad.shape[1] == 2 * 8 * 2400
    assert np.all(np.asarray(f0_pad[:, t:]) == np.asarray(f0[:, -1:]))
    (loss_ref, _), grads_ref = _unsharded_step(
        task, variables, x_pad, f0_pad, key)

    step = seqpar.make_sharded_train_fn(task, mesh, pad_align=2400)
    loss_s, grads_s, _, _ = step(
        variables["params"], variables.get("stats", {}),
        variables.get("batch_stats", {}), x, f0, key)
    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=2e-4, atol=2e-5)
    flat_r, _ = jax.tree_util.tree_flatten(grads_ref)
    flat_s, _ = jax.tree_util.tree_flatten(grads_s)
    for gr, gs in zip(flat_r, flat_s):
        gr, gs = np.asarray(gr), np.asarray(gs)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gs / scale, gr / scale,
                                   rtol=5e-3, atol=5e-4)


def test_sharded_minphase_fir_matches():
    """LTVMinimumPhaseFIRFilter (golf-v1 harm filter): causal frame FIR
    with left-halo exchange == unsharded module output."""
    from golf_tpu.models.filters import LTVMinimumPhaseFIRFilter
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=1, time=8)
    rng = np.random.default_rng(2)
    b, hop, f_glob = 2, 240, 8 * 4
    t = hop * f_glob
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    log_mag = jnp.asarray(
        rng.standard_normal((b, f_glob, 17)).astype(np.float32) * 0.3 - 1)
    mod = LTVMinimumPhaseFIRFilter(window="hanning", n_mag=17)
    y_ref = mod.apply({}, Sig(x, 1), Sig(log_mag, hop)).data

    def body(x_loc):
        env = seqpar.SeqParEnv("time", 8, t, b, None, 1)
        with seqpar.activate(env):
            return mod.apply({}, Sig(x_loc, 1), Sig(log_mag, hop)).data

    y_s = shard_map(body, mesh=mesh, in_specs=(P(None, "time"),),
                    out_specs=P(None, "time"), check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_sss_loss_matches():
    """Sharded SSS loss (halo-exchanged frames, incl. reflect edges and
    a truncated valid region) == unsharded on the valid prefix."""
    from golf_tpu.loss.spec import SSSLoss
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=1, time=8)
    rng = np.random.default_rng(0)
    b, t = 3, 8 * 2400
    valid = t - 239
    pred = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    targ = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))

    for n_fft in (509, 1021):
        hop = int(n_fft - n_fft * 0.75)
        ref = SSSLoss(n_fft=n_fft, hop_length=hop, window="hanning")(
            pred[:, :valid], targ[:, :valid])

        def body(p, tt):
            env = seqpar.SeqParEnv("time", 8, t, b, None, 1)
            env.valid_len = valid
            return seqpar.sss_loss_sharded(
                p, tt, n_fft, hop, 1.0, "hanning", 1e-8, env)

        got = shard_map(
            body, mesh=mesh, in_specs=(P(None, "time"), P(None, "time")),
            out_specs=P(), check_vma=False)(pred, targ)
        np.testing.assert_allclose(float(got), float(ref),
                                   rtol=1e-5, atol=1e-6)


def test_allpole_sharded_order22_long():
    """In-context sharded all-pole at production scale: order 22,
    T=57600 (2.4 s @ 24 kHz), forward + adjoint vs the blocked kernel."""
    from golf_tpu.ops.allpole import allpole
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from golf_tpu.ops.dsp import rc2lpc

    mesh = make_mesh(data=1, time=8)
    rng = np.random.default_rng(1)
    b, t, p = 2, 57600, 22
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.3)
    hop = 240
    frames = t // hop + 1
    rc = np.tanh(rng.standard_normal((b, frames, p)) * 0.25)
    up = np.stack([np.stack(
        [np.interp(np.arange(t) / hop, np.arange(frames), rc[bi, :, j])
         for j in range(p)], -1) for bi in range(b)])
    a = jnp.asarray(rc2lpc(jnp.asarray(up.astype(np.float32))))
    w = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))

    def sharded_loss(x, a):
        def body(xx, aa):
            env = seqpar.SeqParEnv("time", 8, t, b, None, 1)
            y = seqpar.allpole_sharded(xx, aa, env)
            return jax.lax.psum(
                jnp.sum(y * jax.lax.dynamic_slice_in_dim(
                    w, seqpar.tidx(env) * (t // 8), t // 8, axis=1)),
                "time"), y
        loss, y = shard_map(
            body, mesh=mesh,
            in_specs=(P(None, "time"), P(None, "time", None)),
            out_specs=(P(), P(None, "time")), check_vma=False)(x, a)
        return loss, y

    (loss_s, y_s), vjp = jax.vjp(lambda x, a: sharded_loss(x, a), x, a)
    gx_s, ga_s = vjp((jnp.float32(1.0), jnp.zeros_like(y_s)))

    def ref_loss(x, a):
        return jnp.sum(allpole(x, a) * w)

    y_ref = allpole(x, a)
    gx_r, ga_r = jax.grad(ref_loss, argnums=(0, 1))(x, a)

    scale = np.abs(np.asarray(y_ref)).max() + 1e-9
    assert np.abs(np.asarray(y_s) - np.asarray(y_ref)).max() / scale < 1e-3
    gs = np.abs(np.asarray(gx_r)).max() + 1e-9
    assert np.abs(np.asarray(gx_s) - np.asarray(gx_r)).max() / gs < 2e-3
    gas = np.abs(np.asarray(ga_r)).max() + 1e-9
    assert np.abs(np.asarray(ga_s) - np.asarray(ga_r)).max() / gas < 2e-3


@pytest.mark.parametrize("case", [
    "mlsa_min", "mlsa_taylor", "cep_zero", "cep_min", "world_sp", "pqmf"])
def test_sharded_stft_filters_match(case):
    """STFT-domain LTV filters (MLSA freq-domain + time-domain Taylor,
    NHV cepstral, ∇WORLD spectral envelope) under time sharding ==
    unsharded module output on the valid prefix (reference filter
    variants, ``models/filters.py:529-760``)."""
    from golf_tpu.models.filters import (
        LTVMLSAFilter, LTVCepFilter, DiffWorldSPFilter)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=1, time=8)
    rng = np.random.default_rng(3)
    b, hop = 2, 240
    tl = 8 * hop
    t = 8 * tl
    f_glob = t // hop
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))

    if case == "mlsa_min":
        mod = LTVMLSAFilter(filter_order=24, frame_period=hop,
                            fft_length=1024, phase="minimum")
        ctrl = rng.standard_normal((b, f_glob, 25)).astype(np.float32) * 0.3
    elif case == "mlsa_taylor":
        mod = LTVMLSAFilter(filter_order=24, frame_period=hop,
                            mode="multi-stage", cep_order=64,
                            taylor_order=6)
        ctrl = rng.standard_normal((b, f_glob, 25)).astype(np.float32) * 0.2
    elif case in ("cep_zero", "cep_min"):
        mod = LTVCepFilter(filter_order=120, n_fft=1024, hop_length=hop,
                           phase=("zero" if case == "cep_zero"
                                  else "minimum"))
        ctrl = rng.standard_normal(
            (b, f_glob, 121)).astype(np.float32) * 0.1
    elif case == "world_sp":
        mod = DiffWorldSPFilter(n_mels=40, n_fft=1024, hop_length=hop)
        ctrl = np.abs(
            rng.standard_normal((b, f_glob, 40))).astype(np.float32) + 0.1
    else:
        from golf_tpu.models.filters import LTVPQMF
        mod = LTVPQMF(n_mag=8, filter_order=63)
        ctrl = rng.standard_normal((b, f_glob, 8)).astype(np.float32) * 0.3
    ctrl = jnp.asarray(ctrl)

    y_ref = mod.apply({}, Sig(x, 1), Sig(ctrl, hop)).data

    def body(x_loc):
        env = seqpar.SeqParEnv("time", 8, t, b, None, 1)
        with seqpar.activate(env):
            return mod.apply({}, Sig(x_loc, 1), Sig(ctrl, hop)).data

    y_s = shard_map(body, mesh=mesh, in_specs=(P(None, "time"),),
                    out_specs=P(None, "time"), check_vma=False)(x)
    n = min(y_ref.shape[1], t - hop)
    ref, got = np.asarray(y_ref)[:, :n], np.asarray(y_s)[:, :n]
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale,
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("variant", ["mlsa", "nhv"])
def test_seqpar_stft_variant_training_step_matches(variant):
    """Full training step of the STFT-filter decoder variants (MLSA
    source-filter, NHV harmonic-plus-noise with cepstral harm filter) on
    an 8-way time mesh == single-device loss/gradients."""
    mesh = make_mesh(data=1, time=8)
    cfg = _tiny_golf_cfg(1)
    osc = {"class_path": "models.synth.AdditivePulseTrain",
           "init_args": {"num_harmonics": 16}}
    if variant == "mlsa":
        cfg["decoder"]["init_args"]["harm_oscillator"] = osc
        cfg["decoder"]["init_args"]["end_filter"] = {
            "class_path": "models.filters.LTVMLSAFilter",
            "init_args": {"mode": "freq-domain", "frame_length": 512,
                          "fft_length": 512, "window": "hanning",
                          "filter_order": 12, "frame_period": 240,
                          "alpha": 0.46, "phase": "minimum"}}
    else:
        cfg["decoder"] = {
            "class_path": "models.hpn.HarmonicPlusNoiseSynth",
            "init_args": {
                "harm_oscillator": osc,
                "noise_generator": {
                    "class_path": "models.noise.StandardNormalNoise"},
                "noise_filter": {
                    "class_path": "models.filters.LTVZeroPhaseFIRFilter",
                    "init_args": {"window": "hanning", "n_mag": 33}},
                "harm_filter": {
                    "class_path": "models.filters.LTVCepFilter",
                    "init_args": {"n_fft": 512, "window": "hanning",
                                  "filter_order": 60, "hop_length": 240,
                                  "phase": "min"}},
                "end_filter": {
                    "class_path": "models.filters.LTIAcousticFilter",
                    "init_args": {"length": 32, "conv_method": "fft"}}}}
    task = build_voice_autoencoder(cfg)
    b, t = 2, 8 * 2400
    x, f0 = _make_inputs(b, t, seed=13)
    variables = _init_task(task, x, f0)
    key = jax.random.key(21)

    (loss_ref, _), grads_ref = _unsharded_step(task, variables, x, f0, key)
    step = seqpar.make_sharded_train_fn(task, mesh)
    loss_s, grads_s, _, _ = step(
        variables["params"], variables.get("stats", {}),
        variables.get("batch_stats", {}), x, f0, key)
    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=5e-4, atol=5e-5)
    flat_r, _ = jax.tree_util.tree_flatten(grads_ref)
    flat_s, _ = jax.tree_util.tree_flatten(grads_s)
    for gr, gs in zip(flat_r, flat_s):
        gr, gs = np.asarray(gr), np.asarray(gs)
        scale = np.abs(gr).max() + 1e-6
        # atol 2e-3 of the leaf max: the MLSA/cep chain stacks ~4 FFT /
        # hilbert / log-exp stages, whose fp32 reassociation noise on
        # near-zero gradient components exceeds the GOLF-chain tolerance
        np.testing.assert_allclose(gs / scale, gr / scale,
                                   rtol=5e-3, atol=2e-3)


def test_global_wrapped_cumsum_bit_matches_canonical():
    """seqpar.global_wrapped_cumsum reproduces ops.dsp.wrapped_cumsum
    BIT-exactly on an 8-way time mesh (same per-block cumsums, same
    redundantly-run global mod-1 scan), so harmonic phase is identical
    between the sharded and unsharded oscillator paths."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from golf_tpu.ops.dsp import wrapped_cumsum

    mesh = make_mesh(data=1, time=8)
    rng = np.random.default_rng(3)
    x = rng.uniform(0.001, 0.05, (3, 8 * 2400)).astype(np.float32)
    want = np.asarray(wrapped_cumsum(jnp.asarray(x)))

    def body(z):
        env = seqpar.SeqParEnv(time_axis="time", n_time=8,
                               t_global=x.shape[1], b_global=3)
        return seqpar.global_wrapped_cumsum(z, env)

    got = shard_map(body, mesh=mesh, in_specs=P(None, "time"),
                    out_specs=P(None, "time"), check_vma=False)(
        jnp.asarray(x))
    assert np.array_equal(np.asarray(got), want)
