"""Streaming synthesis (golf_tpu.serve.GOLFStream) parity vs the one-shot
offline decoder: chunked push/flush with carried state must reproduce the
offline output on every sample of the offline support."""

import jax
import jax.numpy as jnp
import numpy as np

from golf_tpu.core.sig import Sig
from golf_tpu.models.filters import (LTIAcousticFilter,
                                     LTVMinimumPhaseFilterPrecise,
                                     LTVZeroPhaseFIRFilter)
from golf_tpu.models.noise import NoiseInterface
from golf_tpu.models.sf import SourceFilterSynth
from golf_tpu.models.synth import DownsampledIndexedGlottalFlowTable
from golf_tpu.ops.allpole import allpole, allpole_stream
from golf_tpu.serve import GOLFStream

CHUNK = 2400
N_CHUNKS = 8
T = CHUNK * N_CHUNKS
HOP = 240
B = 2


class InjectedNoise(NoiseInterface):
    """Noise values supplied as a ctrl param, so the offline run and the
    stream consume the identical field."""

    def __call__(self, ref: Sig, noise: Sig) -> Sig:
        return ref.new(noise.data[:, :ref.data.shape[1]])


def _build():
    decoder = SourceFilterSynth(
        harm_oscillator=DownsampledIndexedGlottalFlowTable(
            hop_rate=10, in_channels=16, oversampling=4, equal_energy=True,
            table_type="derivative", normalize_method="constant_power",
            align_peak=True, trainable=False, min_R_d=0.3, max_R_d=2.7,
            lf_v2=True, points=128, table_size=16),
        noise_generator=InjectedNoise(),
        noise_filter=LTVZeroPhaseFIRFilter(window="hanning", n_mag=33),
        end_filter=LTVMinimumPhaseFilterPrecise(
            lpc_order=8, lpc_parameterisation="rc2lpc"),
        room_filter=LTIAcousticFilter(length=32, conv_method="fft"),
        subtract_harmonics=False,
    )
    r = np.random.default_rng(7)
    frames = T // HOP
    raw = {
        "harm_oscillator_params": (
            Sig(jnp.asarray(r.standard_normal(
                (B, frames, 16)).astype(np.float32) * 0.1), HOP),),
        "noise_generator_params": (),
        "noise_filter_params": (
            Sig(jnp.asarray(r.standard_normal(
                (B, frames, 33)).astype(np.float32) * 0.1 - 3.0), HOP),),
        "end_filter_params": (
            Sig(jnp.asarray(r.standard_normal(
                (B, frames)).astype(np.float32) * 0.1), HOP),
            Sig(jnp.asarray(r.standard_normal(
                (B, frames, 8)).astype(np.float32) * 0.3), HOP)),
        "room_filter_params": (),
    }
    f0 = 150.0 + 60.0 * np.sin(np.linspace(0, 9.0, T))[None, :] \
        * np.ones((B, 1))
    phase = jnp.asarray((f0 / 24000.0).astype(np.float32))
    noise = jnp.asarray(
        r.standard_normal((B, T)).astype(np.float32) * 0.03)

    variables = jax.jit(lambda ph, rw, nz: decoder.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        ph, method=lambda m, p_: m(
            p_, **{**m.apply_ctrl(rw),
                   "noise_generator_params": (Sig(nz, 1),)})))(
        Sig(phase, 1), raw, noise)
    # the room kernel initializes to zeros (identity filter) — randomize
    # it so the streaming tail carry is actually exercised
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = dict(variables["params"])
    params["room_filter"] = {
        "kernel": jnp.asarray(
            r.standard_normal((31,)).astype(np.float32) * 0.05)}
    variables = {**variables, "params": params}
    return decoder, variables, raw, phase, noise


def test_allpole_stream_chunked_matches_oneshot():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((2, 4800)).astype(np.float32))
    a = jnp.asarray(
        (r.standard_normal((2, 4800, 8)) * 0.1).astype(np.float32))
    ref = np.asarray(allpole(x, a))
    zi = None
    outs = []
    for c in range(4):
        y, zi = allpole_stream(x[:, c * 1200:(c + 1) * 1200],
                               a[:, c * 1200:(c + 1) * 1200], zi)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


def test_golf_stream_matches_offline_decoder():
    decoder, variables, raw, phase, noise = _build()

    # ---- offline one-shot ------------------------------------------------
    ctrl = jax.jit(lambda rw: decoder.apply(
        variables, rw, method=lambda m, r_: m.apply_ctrl(r_)))(raw)
    offline = jax.jit(lambda ph, c_, nz: decoder.apply(
        variables, ph,
        rngs={"noise": jax.random.key(2)},
        method=lambda m, p_: m(
            p_, **{**c_, "noise_generator_params": (Sig(nz, 1),)})))(
        Sig(phase, 1), ctrl, noise)
    ref = np.asarray(offline.data)

    # ---- streaming ---------------------------------------------------------
    stream = GOLFStream(decoder, variables, chunk=CHUNK)
    outs = []
    for c in range(N_CHUNKS):
        sl = slice(c * CHUNK, (c + 1) * CHUNK)
        fr = slice(c * (CHUNK // HOP), (c + 1) * (CHUNK // HOP))
        tw = slice(c * (CHUNK // 2400), (c + 1) * (CHUNK // 2400))
        chunk_ctrl = {
            "harm_oscillator_params": (
                Sig(ctrl["harm_oscillator_params"][0].data[:, tw], 2400),),
            "noise_filter_params": (
                Sig(ctrl["noise_filter_params"][0].data[:, fr], HOP),),
            "end_filter_params": (
                Sig(ctrl["end_filter_params"][0].data[:, fr], HOP),
                Sig(ctrl["end_filter_params"][1].data[:, fr], HOP)),
        }
        out = stream.push(chunk_ctrl, phase[:, sl], noise[:, sl])
        if out is not None:
            outs.append(out)
    # leftover ctrl rows past the 8 full chunks (the table-weight
    # Downsampler's AvgPool edge padding yields a 9th row the offline
    # lookup consumes as the final block's interpolation target)
    tail = {"harm_oscillator_params": (
        Sig(ctrl["harm_oscillator_params"][0].data[:, N_CHUNKS:], 2400),)}
    outs.append(stream.flush(tail))
    got = np.concatenate(outs, axis=1)

    t_cmp = ref.shape[1]
    assert got.shape[1] >= t_cmp
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(got[:, :t_cmp] - ref) / scale
    # locate-worst diagnostics on failure
    assert err.max() < 5e-4, (
        err.max(), int(err.argmax() % t_cmp), t_cmp)
