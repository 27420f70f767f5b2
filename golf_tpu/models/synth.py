"""Oscillators and glottal-flow wavetable sources.

Reference: ``models/synth.py``. All oscillators take a normalized-frequency
``phase`` signal (f0/sr, in [0, 0.5]) and integrate it in fp32 (the
reference disables autocast around the cumsum, ``models/synth.py:250-251``;
the same precision discipline is kept here).

TPU-first deviations (math-equivalent):
* harmonic phase integration is one (B, T) cumsum scaled by the harmonic
  index (cumsum is linear) instead of the reference's (B, T, n_harm)
  cumsum — 155x less sequential-scan work;
* wavetable lookup is explicit bilinear gather instead of grid_sample.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.sig import Sig, sig_where
from ..ops.dsp import wrapped_cumsum
from ..ops.lf import build_glottal_table
from ..ops.resample import decimate, sinc_kernel
from .ctrl import Controllable


class OscillatorInterface(Controllable):
    pass


def _bilinear_table_lookup(wrapped_phase: jax.Array, tables: jax.Array,
                           hop: int, row0: Optional[jax.Array] = None
                           ) -> jax.Array:
    """grid_sample-equivalent lookup (reference ``GlottalFlowTable.generate``,
    ``models/synth.py:124-177``).

    wrapped_phase: (B, T) in [0, 1); tables: (B, frames, S) at frame-hop
    ``hop``. Returns (B, T).

    TPU formulation: the frame coordinate of sample t is t/hop, so every
    block of ``hop`` consecutive samples interpolates between the SAME two
    table rows. Reshaping time to (blocks, hop) turns the lookup into four
    small batched ``take_along_axis`` gathers over the wavetable axis —
    the naive flattened 2-D gather takes minutes to compile on the TPU
    toolchain and runs far slower.
    """
    b, t = wrapped_phase.shape
    s = tables.shape[-1]
    blocks = (t + hop - 1) // hop
    frames = tables.shape[1]
    if row0 is not None:
        # time-sharded path: ``wrapped_phase`` is a local window whose
        # first sample sits at global frame ``row0`` (traced); slice the
        # replicated table rows for this window (edge-padded first so
        # every shard sees blocks+1 rows).
        need = blocks + 1
        tables = jnp.concatenate(
            [tables, jnp.repeat(tables[:, -1:], need, axis=1)], axis=1)
        tables = jax.lax.dynamic_slice_in_dim(tables, row0, need, axis=1)
    elif frames < blocks + 1:
        pad = blocks + 1 - frames
        tables = jnp.concatenate(
            [tables, jnp.repeat(tables[:, -1:], pad, axis=1)], axis=1)
    else:
        tables = tables[:, : blocks + 1]
    t_pad = blocks * hop
    ph = jnp.pad(wrapped_phase, ((0, 0), (0, t_pad - t)))
    ph = ph.reshape(b, blocks, hop)
    if _use_pallas_lookup(hop, s):
        out = _lookup_blocks(ph, tables[:, :blocks + 1], hop)
    else:
        out = _lookup_blocks_jnp(ph, tables, hop)
    return out.reshape(b, t_pad)[:, :t]


def _lookup_blocks_jnp(ph: jax.Array, tables: jax.Array,
                       hop: int) -> jax.Array:
    """Gather realization on blocked inputs: ph (B, blocks, hop) in [0,1),
    tables (B, >=blocks+1, S). Slow on TPU (serial gathers) — the XLA
    fallback and the VJP rule for the Pallas forward."""
    blocks = ph.shape[1]
    s = tables.shape[-1]
    # wrap-around column for phase interpolation across the period boundary
    padded = jnp.concatenate([tables, tables[:, :, :1]], axis=2)  # (B,F,S+1)
    col = ph * s                                   # in [0, S)
    c0 = jnp.clip(jnp.floor(col), 0, s - 1).astype(jnp.int32)
    cw = col - c0

    tab0 = padded[:, :blocks]                      # rows k
    tab1 = padded[:, 1:blocks + 1]                 # rows k+1

    v00 = jnp.take_along_axis(tab0, c0, axis=2)
    v01 = jnp.take_along_axis(tab0, c0 + 1, axis=2)
    v10 = jnp.take_along_axis(tab1, c0, axis=2)
    v11 = jnp.take_along_axis(tab1, c0 + 1, axis=2)
    top = v00 * (1 - cw) + v01 * cw
    bot = v10 * (1 - cw) + v11 * cw
    rw = (jnp.arange(hop, dtype=ph.dtype) / hop)[None, None, :]
    return top * (1 - rw) + bot * rw


def _use_pallas_lookup(hop: int, s: int) -> bool:
    import os
    if os.environ.get("GOLF_TPU_NO_PALLAS_LOOKUP"):
        return False
    if jax.default_backend() in ("cpu",):
        return False
    from ..ops.lookup_pallas import lookup_supported
    return lookup_supported(hop, s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lookup_blocks(ph: jax.Array, tables: jax.Array, hop: int) -> jax.Array:
    from ..ops.lookup_pallas import bilinear_lookup_pallas
    return bilinear_lookup_pallas(ph, tables, hop)


def _lookup_blocks_fwd(ph, tables, hop):
    from ..ops.lookup_pallas import bilinear_lookup_pallas_res, \
        bwd_supported
    if _use_pallas_lookup(hop, tables.shape[-1]) and \
            bwd_supported(hop, tables.shape[-1]):
        # Save the corner-difference residuals so the backward's phase
        # half is elementwise (no recomputed lookup dot): the jnp-vjp
        # fallback replays the SLOW XLA gather forward (~500 ms at the
        # B=32 training shape vs ~30 ms — docs/BENCH.md round 4), and
        # the round-4 recompute adjoint owned 219 ms of the training
        # backward (docs/results_r5/bwd_stage.json).
        out, dtop, dbot = bilinear_lookup_pallas_res(ph, tables, hop)
        return out, (ph, tables, dtop, dbot)
    return _lookup_blocks(ph, tables, hop), (ph, tables, None, None)


def _lookup_blocks_bwd(hop, res, g):
    ph, tables, dtop, dbot = res
    if dtop is not None:
        from ..ops.lookup_pallas import bilinear_lookup_pallas_dtab, \
            dph_from_res
        d_ph = dph_from_res(g, dtop, dbot, tables.shape[-1], hop)
        d_tables = bilinear_lookup_pallas_dtab(ph, g, hop, tables)
        return d_ph, d_tables
    _, vjp = jax.vjp(lambda p_, t_: _lookup_blocks_jnp(p_, t_, hop),
                     ph, tables)
    return vjp(g)


_lookup_blocks.defvjp(_lookup_blocks_fwd, _lookup_blocks_bwd)


class GlottalFlowTable(OscillatorInterface):
    """Precomputed LF glottal pulse table over a log-spaced Rd grid
    (reference ``models/synth.py:58-191``).

    Performance note: the Pallas one-hot-matmul lookup fast path
    (ops/lookup_pallas.py — the 10x serving win on TPU) requires
    ``points`` to be a multiple of 128; other values (including this
    class's reference-compatible default of 1000) silently fall back to
    the slow XLA gather. Shipped configs set ``points: 2048``."""

    table_size: int = 100
    table_type: str = "derivative"
    normalize_method: Optional[str] = "constant_power"
    align_peak: bool = True
    trainable: bool = False
    min_R_d: float = 0.3
    max_R_d: float = 2.7
    lf_v2: bool = False
    points: int = 1000

    def setup(self):
        table = build_glottal_table(
            table_size=self.table_size, table_type=self.table_type,
            normalize_method=self.normalize_method,
            align_peak=self.align_peak, min_R_d=self.min_R_d,
            max_R_d=self.max_R_d, lf_v2=self.lf_v2, points=self.points)
        if self.trainable:
            self.table = self.param("table", lambda key: jnp.asarray(table))
        else:
            # The wavetable must enter jit as a runtime operand, NOT an
            # embedded constant: with a constant table the XLA TPU
            # backend compiles the downstream bilinear lookup into a
            # pathological form (measured 47 ms vs 0.1 ms per 6 s clip
            # on v5e, and ~5 min compiles; optimization_barrier does not
            # help). Routing it through a variable collection makes it a
            # parameter of every jitted caller.
            self.table = self.variable(
                "batch_stats", "glottal_table",
                lambda: jnp.asarray(table)).value

    def generate(self, wrapped_phase: Sig, tables: Sig) -> Sig:
        assert wrapped_phase.hop == 1
        out = _bilinear_table_lookup(
            wrapped_phase.data, tables.data, tables.hop)
        return Sig(out, 1)

    def _interp_tables(self, weight: Sig) -> Sig:
        """Scalar index in [0,1] -> linear mix of adjacent tables."""
        num_tables, _ = self.table.shape
        raw = weight.data * (num_tables - 1)
        floor = jnp.clip(raw.astype(jnp.int32), 0, num_tables - 2)
        p = (raw - floor)[..., None]
        t0 = self.table[floor]
        t1 = self.table[floor + 1]
        return Sig(t0 * (1 - p) + t1 * p, weight.hop)


class IndexedGlottalFlowTable(GlottalFlowTable):
    """Scalar-index table lookup with optional oversampled integration
    (reference ``models/synth.py:194-263``)."""

    oversampling: int = 1
    equal_energy: bool = False

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (1,)

    def ctrl(self, logits: Sig) -> Tuple[Sig, ...]:
        return (Sig(jax.nn.sigmoid(logits.data), logits.hop),)

    def __call__(self, phase: Sig, table_select_weight: Sig,
                 phase_offset: Optional[Sig] = None) -> Sig:
        assert table_select_weight.ndim == 2
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            return self._call_sharded(phase, table_select_weight,
                                      phase_offset, env)
        interp = self._interp_tables(table_select_weight)
        k = self.oversampling
        if k > 1:
            interp = Sig(interp.data, interp.hop * k)
            phase = Sig(phase.data / k, phase.hop * k)
        up_phase = phase.reduce_hop_length()
        wrapped = wrapped_cumsum(up_phase.data.astype(jnp.float32))
        if phase_offset is not None:
            wrapped = (wrapped + phase_offset.data) % 1
        y = self.generate(Sig(wrapped, 1), interp)
        if self.equal_energy:
            y = Sig(y.data * jax.lax.rsqrt(up_phase.data), 1)
        if k > 1:
            y = Sig(decimate(y.data, k), 1)
        return y

    def _call_sharded(self, phase: Sig, table_select_weight: Sig,
                      phase_offset, env) -> Sig:
        """Time-sharded source generation: oversampled phase integration
        via global cumsum, wavetable lookup against the replicated table
        frames at a per-shard row offset, halo-exchanged decimation."""
        from ..parallel import seqpar
        assert phase_offset is None, "phase_offset unsupported when sharded"
        assert phase.hop == 1
        interp = self._interp_tables(table_select_weight)  # global frames
        k = self.oversampling
        if k > 1:
            ph = seqpar.upsample_local(phase.data / k, k, env)
        else:
            ph = phase.data
        wrapped = seqpar.global_wrapped_cumsum(ph.astype(jnp.float32), env)
        hop_os = interp.hop * k
        t_os_loc = ph.shape[1]
        assert t_os_loc % hop_os == 0, (t_os_loc, hop_os)
        row0 = seqpar.tidx(env) * (t_os_loc // hop_os)
        out = _bilinear_table_lookup(wrapped, interp.data, hop_os,
                                     row0=row0)
        if self.equal_energy:
            out = out * jnp.where(ph > 0, jax.lax.rsqrt(
                jnp.where(ph > 0, ph, 1.0)), 0.0)
        if k > 1:
            # zero the beyond-signal oversampled tail (global length is
            # (T-1)*k + 1), then decimate with halo exchange
            gidx = (seqpar.tidx(env) * t_os_loc + jnp.arange(t_os_loc))
            out = jnp.where(gidx <= (env.t_global - 1) * k, out, 0.0)
            out = seqpar.decimate_sharded(out, k, env)
        return Sig(out, 1)


class WeightedGlottalFlowTable(GlottalFlowTable):
    """Softmax mix over all tables (reference :266-294)."""

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.table_size,)

    def ctrl(self, logits: Sig) -> Tuple[Sig, ...]:
        return (Sig(jax.nn.softmax(logits.data, axis=2), logits.hop),)

    def __call__(self, phase: Sig, table_select_weight: Sig,
                 phase_offset: Optional[Sig] = None) -> Sig:
        assert table_select_weight.ndim == 3
        weighted = Sig(table_select_weight.data @ self.table,
                       table_select_weight.hop)
        up_phase = phase.reduce_hop_length()
        wrapped = wrapped_cumsum(up_phase.data.astype(jnp.float32))
        if phase_offset is not None:
            wrapped = (wrapped + phase_offset.data) % 1
        return self.generate(Sig(wrapped, 1), weighted)


class Downsampler(nn.Module):
    """AvgPool(hop_rate) -> 1x1 conv -> GLU -> 1x1 conv (reference
    ``get_downsampler``, ``models/synth.py:297-315``). Input (B, T, C)."""

    hop_rate: int
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        k = self.hop_rate
        pad = k // 2
        hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
        # window == stride: the avgpool is a reshape-mean. (A strided
        # reduce_window here takes minutes to compile on the TPU toolchain
        # and runs ~1000x slower than this.)
        frames = (hp.shape[1] - k) // k + 1
        pooled = hp[:, : frames * k].reshape(
            hp.shape[0], frames, k, hp.shape[-1]).mean(axis=2)
        x = nn.Dense(self.in_channels * 2)(pooled)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        return nn.Dense(self.out_channels)(x)


class DownsampledIndexedGlottalFlowTable(IndexedGlottalFlowTable):
    """Hidden frames -> downsampler -> scalar index at 10x coarser hop
    (reference :318-340). Used by every GOLF config."""

    hop_rate: int = 10
    in_channels: int = 64

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.in_channels,)

    def setup(self):
        super().setup()
        self.model = Downsampler(self.hop_rate, self.in_channels, 1)

    def ctrl(self, h: Sig) -> Tuple[Sig, ...]:
        out = self.model(h.data)[..., 0]
        return (Sig(jax.nn.sigmoid(out), h.hop * self.hop_rate),)


class WrappedPhaseDownsampledIndexedGlottalFlowTable(
        DownsampledIndexedGlottalFlowTable):
    """Consumes externally wrapped phase directly (reference :343-375)."""

    def __call__(self, wrapped_phase: Sig, table_select_weight: Sig,
                 phase_offset: Optional[Sig] = None) -> Sig:
        assert wrapped_phase.hop == 1
        interp = self._interp_tables(table_select_weight)
        return self.generate(wrapped_phase, interp)


class DownsampledWeightedGlottalFlowTable(WeightedGlottalFlowTable):
    """Downsampler -> softmax table weights (reference :378-400)."""

    hop_rate: int = 10
    in_channels: int = 64

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.in_channels,)

    def setup(self):
        super().setup()
        self.model = Downsampler(self.hop_rate, self.in_channels,
                                 self.table_size)

    def ctrl(self, h: Sig) -> Tuple[Sig, ...]:
        out = jax.nn.softmax(self.model(h.data), axis=-1)
        return (Sig(out, h.hop * self.hop_rate),)


class HarmonicOscillator(OscillatorInterface):
    """Additive sine bank with hard anti-aliasing (reference :403-446)."""

    def _synth(self, phase: Sig, amplitudes: Sig,
               initial_phase: Optional[jax.Array] = None,
               phase_offset: Optional[Sig] = None) -> Sig:
        from ..parallel import seqpar
        env = seqpar.current()
        n_harm = amplitudes.shape[-1]
        harm_series = jnp.arange(1, n_harm + 1, dtype=jnp.float32)
        if env is not None:
            assert initial_phase is None and phase_offset is None
            assert phase.hop == 1
            up_phase = phase
            base = seqpar.global_wrapped_cumsum(
                up_phase.data.astype(jnp.float32), env)
            amplitudes = seqpar.localize(amplitudes, env, 1) \
                if amplitudes.hop > 1 else amplitudes
        else:
            up_phase = phase.reduce_hop_length()      # (B, T) hop 1
            # one WRAPPED fp32 cumsum; per-harmonic phase = k * base is
            # exact mod 1 for integer k: sin(2*pi*k*(c%1)) == sin(2*pi*k*c)
            base = wrapped_cumsum(up_phase.data.astype(jnp.float32))
        inst = base[..., None] * harm_series          # (B, T, n)
        if phase_offset is not None:
            inst = inst + phase_offset.data[..., None] * harm_series
        if initial_phase is not None:
            init = initial_phase.data if isinstance(initial_phase, Sig) \
                else initial_phase
            inst = inst + init[:, None, :]
        # anti-aliasing: zero amplitude at/above Nyquist
        harm_freq = up_phase.data[..., None] * harm_series
        amp = amplitudes.reduce_hop_length().truncate(base.shape[1])
        t = min(amp.steps, base.shape[1])
        amp_d = amp.data[:, :t]
        harm_freq = harm_freq[:, :t]
        inst = inst[:, :t]
        amp_d = jnp.where(harm_freq >= 0.5, 0.0, amp_d)
        out = jnp.einsum("btn,btn->bt",
                         jnp.sin(inst * (2 * math.pi)), amp_d)
        return Sig(out, 1)

    def __call__(self, phase: Sig, amplitudes: Sig,
                 initial_phase=None, phase_offset=None) -> Sig:
        return self._synth(phase, amplitudes, initial_phase, phase_offset)


class AdditiveSynthesizer(HarmonicOscillator):
    """DDSP additive: amp = exp(log_gain) * sigmoid(logits), scaled by
    1/sqrt(num_freq_bins) (reference :449-468)."""

    num_harmonics: int = 150

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (1, self.num_harmonics)

    def ctrl(self, log_gain: Sig, amp_logits: Sig) -> Tuple[Sig, ...]:
        amp = jnp.exp(log_gain.data)[..., None] * \
            jax.nn.sigmoid(amp_logits.data)
        return (Sig(amp, amp_logits.hop),)

    def __call__(self, phase: Sig, amplitudes: Sig, **kwargs) -> Sig:
        num_freq_bins = 0.5 / phase
        amplitudes = amplitudes * Sig(
            jax.lax.rsqrt(num_freq_bins.data), num_freq_bins.hop)
        return self._synth(phase, amplitudes, **kwargs)


class V1AdditiveSynthesizer(HarmonicOscillator):
    """ISMIR variant: sigmoid amps normalized to sum 1 (reference :471-483)."""

    num_harmonics: int = 150

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (1, self.num_harmonics)

    def ctrl(self, log_gain: Sig, amp_logits: Sig) -> Tuple[Sig, ...]:
        s = jax.nn.sigmoid(amp_logits.data)
        s = s / jnp.sum(s, axis=-1, keepdims=True)
        return (Sig(jnp.exp(log_gain.data)[..., None] * s, amp_logits.hop),)


class SawToothOscillator(HarmonicOscillator):
    """Fixed 1/k amplitudes (SawSing; reference :486-504)."""

    num_harmonics: int = 155
    gain: float = 0.4

    def __call__(self, phase: Sig, initial_phase=None, phase_offset=None,
                 **kwargs) -> Sig:
        amps = 1.0 / jnp.arange(1, self.num_harmonics + 1, dtype=jnp.float32)
        amplitudes = Sig(
            jnp.broadcast_to(amps, phase.shape + (self.num_harmonics,)),
            phase.hop)
        return self._synth(phase, amplitudes, initial_phase, phase_offset)


class PulseTrain(OscillatorInterface):
    """Impulse at each phase wrap, amplitude rsqrt(f0_norm)
    (reference :507-523)."""

    @nn.compact
    def __call__(self, phase: Sig, phase_offset: Optional[Sig] = None) -> Sig:
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            assert phase_offset is None and phase.hop == 1
            up = phase.data
            wrapped = seqpar.global_wrapped_cumsum(
                up.astype(jnp.float32), env)
            prev = jnp.concatenate(
                [seqpar.halo_left(wrapped, 1, env), wrapped[:, :-1]],
                axis=1)
            # shard 0's first sample sees prev=0 <= wrapped -> no pulse,
            # matching the unsharded out[0] = 0
            transition = (wrapped - prev) < 0
            return Sig(jnp.where(transition, jax.lax.rsqrt(up), 0.0), 1)
        up = phase.reduce_hop_length().data
        wrapped = wrapped_cumsum(up.astype(jnp.float32))
        if phase_offset is not None:
            wrapped = (wrapped + phase_offset.data) % 1
        transition = (wrapped[:, 1:] - wrapped[:, :-1]) < 0
        out = jnp.zeros_like(up)
        out = out.at[:, 1:].set(
            jnp.where(transition, jax.lax.rsqrt(up[:, 1:]), 0.0))
        return Sig(out, 1)


class AdditivePulseTrain(HarmonicOscillator):
    """Band-limited pulse train: all-ones harmonic bank scaled by
    sqrt(2*phase) (reference :526-547)."""

    num_harmonics: int = 155

    def __call__(self, phase: Sig, initial_phase=None, phase_offset=None,
                 **kwargs) -> Sig:
        num_freq_bins = 0.5 / phase.data
        amp = jax.lax.rsqrt(num_freq_bins)[..., None]
        amplitudes = Sig(
            jnp.broadcast_to(amp, phase.shape + (self.num_harmonics,)),
            phase.hop)
        return self._synth(phase, amplitudes, initial_phase, phase_offset)
