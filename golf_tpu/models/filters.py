"""Time-varying and time-invariant synthesis filters.

Reference: ``models/filters.py``. The heart of the framework:

* ``LTVMinimumPhaseFilterPrecise`` ("GOLF-ss") — sample-wise time-varying
  all-pole filtering on the blocked-scan Pallas/XLA kernel
  (``golf_tpu.ops.allpole``).
* ``LTVMinimumPhaseFilter`` ("GOLF-ff") — frame-wise constant-coefficient
  LPC + windowed overlap-add.
* minimum-/zero-phase FIR noise shaping via FFT frame convolution.
* MLSA / cepstral / ∇WORLD spectral filters on the mel-cepstrum stack.

Frame convolutions are done in the frequency domain (XLA TPU FFT) — the
TPU-native equivalent of the reference's torch_fftconv path.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.sig import Sig
from ..ops import stft as stft_ops
from ..ops.allpole import allpole, allpole_const, lfilter
from ..ops.cepstrum import (freqt, mc2sp_log, mcep, minimum_phase_response,
                            pqmf_analysis, pqmf_filters)
from ..ops.dsp import (biquads2lpc, complex2biquads, get_logits2biquads,
                       get_radiation_time_filter, get_window_fn, hilbert,
                       lsp2lpc, minimum_phase_fir, params2biquads, rc2lpc,
                       zero_phase_fir)
from .ctrl import Controllable


class FilterInterface(Controllable):
    pass


class LTVFilterInterface(FilterInterface):
    def reverse(self, ex: Sig, y: Sig, *params):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def _overlap_add(frames: jax.Array, window: jax.Array, hop: int,
                 padding: int) -> Tuple[jax.Array, jax.Array]:
    """Windowed OLA with conv_transpose semantics (reference
    ``models/filters.py:169-178``): returns (signal, normalization) where
    normalization is the OLA of the window itself.

    frames: (B, F, W); output length = (F-1)*hop - 2*padding + W.
    """
    b, f, w = frames.shape
    q = -(-w // hop)  # strips per frame
    wpad = q * hop
    fr = jnp.pad(frames * window, ((0, 0), (0, 0), (0, wpad - w)))
    fr = fr.reshape(b, f, q, hop)
    buf = jnp.zeros((b, f + q, hop), frames.dtype)
    for j in range(q):
        buf = buf.at[:, j:j + f].add(fr[:, :, j])
    full = buf.reshape(b, -1)[:, : (f - 1) * hop + w]

    wstrip = jnp.pad(jnp.broadcast_to(window, (f, w)),
                     ((0, 0), (0, wpad - w))).reshape(f, q, hop)
    nbuf = jnp.zeros((f + q, hop), frames.dtype)
    for j in range(q):
        nbuf = nbuf.at[j:j + f].add(wstrip[:, j])
    norm = nbuf.reshape(-1)[: (f - 1) * hop + w]

    if padding:
        full = full[:, padding:-padding]
        norm = norm[padding:-padding]
    return full, norm


from ..ops.fftsize import conv_fft_size as _conv_fft_size
from ..ops.fftsize import smooth_fft_size as _smooth_fft_size  # noqa: F401 (re-export)


def _fft_frame_conv(frames: jax.Array, kernels: jax.Array, hop: int,
                    correlate: bool) -> jax.Array:
    """Per-frame linear convolution/correlation via FFT.

    frames: (B, F, L); kernels: (B, F, K). Returns (B, F, hop): the segment
    [K-1 : K-1+hop] of the full convolution (which equals the valid
    cross-correlation when ``correlate``).
    """
    k = kernels.shape[-1]
    l = frames.shape[-1]
    n = l + k - 1
    nfft = _conv_fft_size(n)
    kern = jnp.flip(kernels, -1) if correlate else kernels
    conv = jnp.fft.irfft(
        jnp.fft.rfft(frames, nfft) * jnp.fft.rfft(kern, nfft), nfft)
    return conv[..., k - 1:k - 1 + hop]


from ..ops.dsp import unfold as _unfold  # gather-free sliding windows


# ---------------------------------------------------------------------------
# Sample-wise time-varying all-pole (GOLF-ss)
# ---------------------------------------------------------------------------

class LTVMinimumPhaseFilterPrecise(LTVFilterInterface):
    """Sample-wise LTV all-pole filter (reference :64-113).

    ctrl: (1, num_logits) -> (exp(log_gain), lpc coefficients) with one of
    four stable parameterisations.
    """

    lpc_order: Optional[int] = None
    lpc_parameterisation: str = "rc2lpc"
    max_abs_value: float = 1.0

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        if self.lpc_order is None:
            return ()
        n = self.lpc_order + (1 if self.lpc_parameterisation == "lsp2lpc"
                              else 0)
        return (1, n)

    def _logits2lpc(self, logits: jax.Array) -> jax.Array:
        rep = self.lpc_parameterisation
        if rep in ("coef", "conj", "real"):
            l2b = get_logits2biquads(rep, self.max_abs_value)
            bi = l2b(logits.reshape(*logits.shape[:-1], -1, 2))
            return biquads2lpc(bi)
        if rep == "rc2lpc":
            return rc2lpc(jnp.tanh(logits) * self.max_abs_value)
        if rep == "lsp2lpc":
            w = jnp.cumsum(jax.nn.softmax(logits, -1), -1)
            w = jnp.roll(w, 1, -1) * jnp.pi
            return lsp2lpc(w)[..., 1:]
        raise ValueError(f"Unknown lpc_parameterisation: {rep}")

    def ctrl(self, log_gain: Sig, lpc_logits: Sig) -> Tuple[Sig, ...]:
        return (Sig(jnp.exp(log_gain.data), log_gain.hop),
                Sig(self._logits2lpc(lpc_logits.data), lpc_logits.hop))

    def __call__(self, ex: Sig, gain: Sig, a: Sig) -> Sig:
        assert ex.ndim == 2 and gain.ndim == 2 and a.ndim == 3
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            # time-sharded: localize the replicated frame-rate gain and
            # coefficients to this shard's sample window, then run the
            # affine-summary boundary-exchange all-pole kernel
            g = seqpar.localize(gain, env, 1) if gain.hop > 1 else gain
            a_loc = seqpar.localize(a, env, 1) if a.hop > 1 else a
            y = seqpar.allpole_sharded(ex.data * g.data, a_loc.data, env)
            return Sig(y, 1)
        exg = ex * gain                       # hop-broadcast multiply
        a_up = a.reduce_hop_length()
        t = min(exg.steps, a_up.steps)
        y = allpole(exg.data[:, :t], a_up.data[:, :t])
        return Sig(y, 1)

    def reverse(self, ex: Sig, y: Sig, gain: Sig, a: Sig
                ) -> Tuple[Sig, Sig]:
        a_up = a.reduce_hop_length().data
        fir = jnp.concatenate(
            [jnp.ones_like(a_up[..., :1]), a_up], axis=-1)
        t = min(y.steps, fir.shape[1])
        from ..ops.dsp import fir_filt
        y_ex = fir_filt(y.data[:, :t], fir[:, :t])
        return ex * gain, Sig(y_ex, 1)


class LTVMinimumPhaseFilter(LTVMinimumPhaseFilterPrecise):
    """Frame-wise approximation: constant-coefficient LPC per overlapping
    window + windowed OLA (reference :116-195)."""

    window: str = "hanning"
    window_length: int = 960
    centred: bool = True

    def setup(self):
        w = get_window_fn(self.window)(self.window_length)
        self._win = jnp.asarray(w, jnp.float32)

    def __call__(self, ex: Sig, gain: Sig, a: Sig) -> Sig:
        hop = gain.hop
        ws = self.window_length
        assert ws >= hop * 2, f"{ws} < {hop * 2}"
        padding = ws // 2

        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            assert self.centred, "time-sharded ff filter needs centred"
            g = seqpar.localize(gain, env, 1)
            exg_l = ex.data * g.data
            a_l = seqpar.localize_frames(a, env).data    # (B, F_loc, p)
            p = a_l.shape[-1]

            def per_frame(frames):
                b_, f_, w_ = frames.shape
                out = allpole_const(frames.reshape(-1, w_),
                                    a_l.reshape(-1, p))
                return out.reshape(b_, f_, w_)

            win_np = np.asarray(
                get_window_fn(self.window)(self.window_length))
            y = seqpar.frame_ola_sharded(per_frame, exg_l, win_np,
                                         hop, env)
            return Sig(y, 1)

        exg = (ex if self.centred else Sig(ex.data[:, hop // 2:], 1)) * gain
        exp_d = jnp.pad(exg.data, ((0, 0), (padding, padding)))
        unfolded = _unfold(exp_d, ws, hop)            # (B, F, ws)
        f = min(unfolded.shape[1], a.steps)
        unfolded = unfolded[:, :f]
        a_d = a.data[:, :f]

        b = unfolded.shape[0]
        filtered = allpole_const(
            unfolded.reshape(-1, ws), a_d.reshape(-1, a_d.shape[-1]))
        filtered = filtered.reshape(b, f, ws)

        y, norm = _overlap_add(filtered, self._win, hop, padding)
        y = y / norm
        if not self.centred:
            y = jnp.pad(y, ((0, 0), (hop // 2, 0)), mode="reflect")
        return Sig(y, 1)


class SampleBasedLTVMinimumPhaseFilter(LTVMinimumPhaseFilterPrecise):
    """Deprecated alias kept for checkpoint/config compat (reference
    :763-790)."""
    pass


# ---------------------------------------------------------------------------
# FIR filters from log-magnitude frames
# ---------------------------------------------------------------------------

class LTVMinimumPhaseFIRFilterPrecise(LTVFilterInterface):
    """Per-sample upsampled minimum-phase FIR (reference :198-241)."""

    window: str = "hanning"
    n_mag: Optional[int] = None

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.n_mag,) if self.n_mag else ()

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        return (x,)

    def _window_kernel(self, kernel: jax.Array) -> jax.Array:
        k = kernel.shape[-1]
        w = np.asarray(get_window_fn(self.window)(k))
        w[: k // 2] = 1.0
        return kernel * jnp.asarray(w, kernel.dtype)

    def __call__(self, ex: Sig, log_mag: Sig) -> Sig:
        kernel = self._window_kernel(minimum_phase_fir(log_mag.data))
        up = Sig(kernel, log_mag.hop).reduce_hop_length()
        from ..ops.dsp import fir_filt
        t = min(ex.steps, up.steps)
        return Sig(fir_filt(ex.data[:, :t], up.data[:, :t]), 1)


class LTVMinimumPhaseFIRFilter(LTVMinimumPhaseFIRFilterPrecise):
    """Frame-wise minimum-phase FIR via FFT conv (reference :244-283)."""

    conv_method: str = "fft"

    def __call__(self, ex: Sig, log_mag: Sig) -> Sig:
        hop = log_mag.hop
        kernel = self._window_kernel(minimum_phase_fir(log_mag.data))
        k = kernel.shape[-1]
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            kl = seqpar.localize_frames(Sig(kernel, hop), env)
            out = seqpar.fir_frame_conv_sharded(
                ex.data, kl.data, hop, k - 1, False, env)
            return Sig(out, 1)
        xp = jnp.pad(ex.data, ((0, 0), (k - 1, 0)))
        unfolded = _unfold(xp, k + hop - 1, hop)
        f = min(unfolded.shape[1], kernel.shape[1])
        out = _fft_frame_conv(unfolded[:, :f], kernel[:, :f], hop,
                              correlate=False)
        return Sig(out.reshape(ex.shape[0], -1), 1)


class LTVZeroPhaseFIRFilterPrecise(LTVFilterInterface):
    """Per-sample zero-phase FIR (reference :286-337)."""

    window: str = "hanning"
    n_mag: Optional[int] = None

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.n_mag,) if self.n_mag else ()

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        return (x,)

    def _window_kernel(self, kernel: jax.Array) -> jax.Array:
        w = get_window_fn(self.window)(kernel.shape[-1])
        return kernel * jnp.asarray(w, kernel.dtype)

    def __call__(self, ex: Sig, log_mag: Sig) -> Sig:
        kernel = self._window_kernel(zero_phase_fir(log_mag.data))
        up = Sig(kernel, log_mag.hop).reduce_hop_length()
        k = kernel.shape[-1]
        pl = (k - 1) // 2
        pr = k - 1 - pl
        xp = jnp.pad(ex.data, ((0, 0), (pl, pr)))
        frames = _unfold(xp, k, 1)                    # (B, T, K)
        t = min(frames.shape[1], up.steps)
        out = jnp.einsum("btk,btk->bt", frames[:, :t], up.data[:, :t])
        return Sig(out, 1)


class LTVZeroPhaseFIRFilter(LTVZeroPhaseFIRFilterPrecise):
    """Frame-wise zero-phase FIR via FFT conv (reference :340-384).

    The default noise filter in every shipped config (n_mag 256)."""

    conv_method: str = "fft"

    def __call__(self, ex: Sig, log_mag: Sig) -> Sig:
        hop = log_mag.hop
        kernel = self._window_kernel(zero_phase_fir(log_mag.data))
        k = kernel.shape[-1]
        padding = (k - 1) // 2
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            kl = seqpar.localize_frames(Sig(kernel, hop), env)
            out = seqpar.fir_frame_conv_sharded(
                ex.data, kl.data, hop, padding, True, env)
            return Sig(out, 1)
        xp = jnp.pad(ex.data, ((0, 0), (padding, padding)))
        unfolded = _unfold(xp, k + hop - 1, hop)
        f = min(unfolded.shape[1], kernel.shape[1])
        out = _fft_frame_conv(unfolded[:, :f], kernel[:, :f], hop,
                              correlate=True)
        return Sig(out.reshape(ex.shape[0], -1), 1)


class LTVAPZeroPhaseFIRFilter(LTVZeroPhaseFIRFilter):
    """Aperiodicity variant: log(sigmoid(x) * sqrt(n_fft)) ctrl
    (reference :387-397)."""

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        n_fft = 2 * (self.n_mag - 1)
        return (Sig(jnp.log(jax.nn.sigmoid(x.data) * math.sqrt(n_fft)),
                    x.hop),)


# ---------------------------------------------------------------------------
# LTI filters
# ---------------------------------------------------------------------------

class LTIRadiationFilter(FilterInterface):
    """Fixed differentiator-like radiation FIR (reference :400-423)."""

    num_zeros: int = 16
    window: str = "hanning"

    def setup(self):
        k = get_radiation_time_filter(
            self.num_zeros, get_window_fn(self.window))
        self._kernel = jnp.asarray(k[::-1].copy(), jnp.float32)

    def __call__(self, ex: Sig) -> Sig:
        k = self._kernel.shape[0]
        pad = k // 2
        xp = jnp.pad(ex.data, ((0, 0), (pad, pad)))[:, None, :]
        out = jax.lax.conv_general_dilated(
            xp, jnp.flip(self._kernel)[None, None, :], (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        return Sig(out[:, 0, :], 1)


class LTIAcousticFilter(FilterInterface):
    """Learnable LTI FIR: identity + strictly-causal learned taps
    (reference :426-456). The ``room_filter``/``end_filter`` of the
    Interspeech configs."""

    length: int = 128
    conv_method: str = "fft"

    @nn.compact
    def __call__(self, ex: Sig) -> Sig:
        kernel = self.param(
            "kernel", nn.initializers.zeros, (self.length - 1,))
        x = ex.data
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            # strictly-causal taps: left halo of L-2 neighbor samples,
            # then one valid FFT correlation per shard
            l = self.length - 1
            ext = jnp.concatenate(
                [seqpar.halo_left(x, l, env), x], axis=1)
            # out[j] = sum_k kernel[k] ext[j+k] = full-conv(ext,
            # flip(kernel))[j + l - 1]
            nfft = 1 << (ext.shape[1] + l - 2).bit_length()
            conv = jnp.fft.irfft(
                jnp.fft.rfft(ext, nfft)
                * jnp.fft.rfft(jnp.flip(kernel), nfft), nfft)
            out = conv[:, l - 1: l - 1 + x.shape[1]]
            return ex + Sig(out, 1)
        # out[n] = sum_k kernel[k] * x[n + k - (L-1)]  (delays 1..L-1),
        # realized as one rfft/irfft full convolution (the unfold-gather
        # and direct-conv forms are compile-hostile on TPU)
        t = x.shape[-1]
        l = self.length - 1
        nfft = 1 << (t + l - 1).bit_length()
        conv = jnp.fft.irfft(
            jnp.fft.rfft(x[:, :-1], nfft)
            * jnp.fft.rfft(jnp.flip(kernel), nfft), nfft)
        # full conv of x[:-1] with reversed kernel gives
        # conv[m] = sum_k kernel[k] x[m - (l-1) + k]; the reference unfold
        # (models/filters.py:443-450) is out[n] = sum_k kernel[k]
        # x[n - l + k], i.e. out[n] = conv[n-1] with out[0] = 0.
        out = jnp.pad(conv[:, :t - 1], ((0, 0), (1, 0)))
        return ex + Sig(out, 1)

    @property
    def impulse_response(self):
        kernel = self.get_variable("params", "kernel")
        return jnp.concatenate([jnp.ones(1), jnp.flip(kernel)])


class LTVPQMF(LTVFilterInterface):
    """PQMF analysis bank with per-band exp-gains, summed
    (reference :459-481)."""

    n_mag: int = 16
    filter_order: int = 127
    alpha: float = 0.0

    def setup(self):
        alpha = self.alpha if self.alpha > 0 else 100.0
        self._filters = jnp.asarray(
            pqmf_filters(self.n_mag, self.filter_order, alpha))

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.n_mag,)

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        return (x,)

    def __call__(self, ex: Sig, log_gain: Sig) -> Sig:
        from ..parallel import seqpar
        env = seqpar.current()
        gain = Sig(jnp.exp(log_gain.data), log_gain.hop)
        if env is not None:
            # halo-exchanged "same" padding for the analysis bank; the
            # per-band gains localize to this shard's window
            g = seqpar.localize(gain, env, 1)         # (B, T_loc, bands)
            taps = self._filters.shape[-1]
            pad_l = (taps - 1) // 2
            ext = jnp.concatenate(
                [seqpar.halo_left(ex.data, pad_l, env), ex.data,
                 seqpar.halo_right(ex.data, taps - 1 - pad_l, env)], axis=1)
            bands = jax.lax.conv_general_dilated(
                ext[:, None, :], jnp.flip(self._filters, -1)[:, None, :],
                (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"))
            out = jnp.sum(jnp.swapaxes(bands, 1, 2) * g.data, axis=2)
            return Sig(out, 1)
        bands = pqmf_analysis(ex.data, self._filters)  # (B, bands, T)
        filtered = Sig(jnp.swapaxes(bands, 1, 2), 1) * gain
        return filtered.sum(axis=2)


class LTIComplexConjAllpassFilter(FilterInterface):
    """Learnable LTI allpass from conjugate pole pairs (reference
    :484-507)."""

    num_roots: int = 8
    max_abs_value: float = 0.99

    @nn.compact
    def __call__(self, ex: Sig) -> Sig:
        gain = 5.0 / 3.0  # tanh gain, torch nn.init.calculate_gain('tanh')
        init = nn.initializers.variance_scaling(
            gain * gain, "fan_avg", "uniform")
        mag_logits = self.param("magnitude_logits", init, (1, self.num_roots))
        cos_logits = self.param("cos_logits", init, (1, self.num_roots))
        mag = jax.nn.sigmoid(mag_logits[0]) * self.max_abs_value
        cos = jnp.tanh(cos_logits[0])
        sin = jnp.sqrt(jnp.maximum(1 - cos ** 2, 0.0))
        roots = mag * (cos + 1j * sin)
        biquads = complex2biquads(roots)
        from ..ops.dsp import coeff_product
        a = coeff_product(biquads[:, None, :])[0]
        b = jnp.flip(a)
        return Sig(lfilter(ex.data, a, b), 1)


class LTIRealCoeffAllpassFilter(FilterInterface):
    """Learnable LTI allpass from real biquad params (reference :510-526)."""

    num_roots: int = 8
    max_abs_value: float = 0.99

    @nn.compact
    def __call__(self, ex: Sig) -> Sig:
        gain = 5.0 / 3.0
        init = nn.initializers.variance_scaling(
            gain * gain, "fan_avg", "uniform")
        logits1 = self.param("logits1", init, (1, self.num_roots))
        logits2 = self.param("logits2", init, (1, self.num_roots))
        biquads = params2biquads(
            jnp.tanh(logits1[0]) * self.max_abs_value,
            jnp.tanh(logits2[0]) * self.max_abs_value)
        from ..ops.dsp import coeff_product
        a = coeff_product(biquads[:, None, :])[0]
        b = jnp.flip(a)
        return Sig(lfilter(ex.data, a, b), 1)


# ---------------------------------------------------------------------------
# Mel-cepstral / spectral-envelope filters
# ---------------------------------------------------------------------------

class LTVMLSAFilter(LTVFilterInterface):
    """Differentiable MLSA synthesis filter, frequency-domain realization
    (reference :529-556; diffsptk MLSA mode='freq-domain').

    mc frames (hop = frame_period) -> warped-cepstrum log spectrum ->
    minimum-phase transfer function -> STFT-domain filtering.
    """

    filter_order: int = 24
    frame_period: int = 240
    alpha: float = 0.46
    gamma: float = 0.0
    mode: str = "freq-domain"
    cep_order: Optional[int] = None
    frame_length: int = 1024
    fft_length: int = 1024
    window: str = "hanning"
    phase: str = "minimum"
    taylor_order: int = 20

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.filter_order + 1,)

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        return (x,)

    def _log_spectrum(self, mc: jax.Array) -> jax.Array:
        # multi-stage ('taylor') mode truncates the unwarped cepstrum at
        # cep_order before evaluating the spectrum; freq-domain mode uses
        # the full half-spectrum order.
        lin_order = (self.cep_order if (self.mode == "multi-stage"
                                        and self.cep_order) else None)
        return mc2sp_log(mc, self.fft_length, self.alpha,
                         lin_order=lin_order)

    def _filter_freq_domain(self, x: jax.Array, mc_d: jax.Array) -> jax.Array:
        n_fft = self.fft_length
        hop = self.frame_period
        log_mag = self._log_spectrum(mc_d)            # (B, F, n_fft//2+1)
        if self.phase in ("minimum", "min"):
            h = minimum_phase_response(log_mag)
        else:
            h = jnp.exp(log_mag).astype(jnp.complex64)
        from ..parallel import seqpar
        env = seqpar.current()
        if env is not None:
            # mc_d already holds this shard's frame rows (see __call__)
            return seqpar.stft_filter_sharded(
                x, h, n_fft, hop, self.window, env, onesided=True)
        spec = stft_ops.stft(x, n_fft, hop, window=self.window, center=True)
        f = min(spec.shape[-1], h.shape[1])
        return stft_ops.istft(
            spec[..., :f] * jnp.swapaxes(h[:, :f], 1, 2), n_fft, hop,
            window=self.window, center=True, length=x.shape[1])

    def _filter_multi_stage(self, x: jax.Array, mc_d: jax.Array) -> jax.Array:
        """Time-domain Taylor-cascade MLSA (reference :529-556 with
        diffsptk ``mode='multi-stage'``, ``taylor_order``).

        H(z) = exp(sum_k c_k z^-k) with c the unwarped causal cepstrum
        (freqt to ``cep_order``); realized as
        y = exp(c0) * sum_{t<=Q} C^t x / t! where C is the time-varying
        FIR with taps c_1..c_K held constant within each frame — each
        stage is one batched per-frame FFT convolution.
        """
        hop = self.frame_period
        k_ord = self.cep_order or 4 * self.filter_order
        c_lin = freqt(mc_d, k_ord, -self.alpha)       # (B, F, K+1)
        gain = jnp.exp(c_lin[..., 0])                 # (B, F)
        taps = c_lin.at[..., 0].set(0.0)

        b, t = x.shape
        frames = mc_d.shape[1]
        from ..parallel import seqpar
        env = seqpar.current()

        if env is not None:
            def tv_fir(u: jax.Array) -> jax.Array:
                return seqpar.fir_frame_conv_sharded(
                    u, taps, hop, k_ord, False, env)
        else:
            def tv_fir(u: jax.Array) -> jax.Array:
                up = jnp.pad(u, ((0, 0), (k_ord, 0)))
                fr = _unfold(up, hop + k_ord, hop)    # (B, F', hop+K)
                seg = _fft_frame_conv(fr[:, :frames], taps, hop,
                                      correlate=False)
                return seg.reshape(b, -1)

        acc = x
        term = x
        for q in range(1, self.taylor_order + 1):
            term = tv_fir(term) / q
            acc = acc + term
        return acc * jnp.repeat(gain, hop, axis=1)[:, :t]

    def __call__(self, ex: Sig, mc: Sig, **kwargs) -> Sig:
        from ..parallel import seqpar
        assert mc.hop == self.frame_period
        hop = self.frame_period
        x = ex.data
        env = seqpar.current()
        if env is not None:
            # x is this shard's window; take the matching ctrl frame rows
            mc_d = seqpar.localize_frames(mc, env).data
        else:
            frames = x.shape[1] // hop
            x = x[:, : frames * hop]
            mc_d = mc.data[:, :frames]
        if self.mode == "multi-stage":
            out = self._filter_multi_stage(x, mc_d)
        else:  # 'freq-domain' (and 'single-stage', realized spectrally)
            out = self._filter_freq_domain(x, mc_d)
        return Sig(out, 1)


class LTVMLSAFilter2(LTVMLSAFilter):
    """Explicit mc->spectrum STFT-domain variant (reference :626-684):
    always the spectral realization, whatever ``mode`` says."""

    def __call__(self, ex: Sig, mc: Sig, **kwargs) -> Sig:
        from ..parallel import seqpar
        assert mc.hop == self.frame_period
        hop = self.frame_period
        x = ex.data
        env = seqpar.current()
        if env is not None:
            mc_d = seqpar.localize_frames(mc, env).data
        else:
            frames = x.shape[1] // hop
            x = x[:, : frames * hop]
            mc_d = mc.data[:, :frames]
        return Sig(self._filter_freq_domain(x, mc_d), 1)


class LTVCepFilter(LTVFilterInterface):
    """NHV harmonic filter: cepstrum frames -> (optionally min-phase) FFT
    transfer -> two-sided STFT filtering (reference :559-623)."""

    filter_order: int = 240
    n_fft: int = 1024
    window: str = "hanning"
    hop_length: int = 240
    phase: str = "zero"

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.filter_order + 1,)

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        return (x,)

    def __call__(self, ex: Sig, ceps: Sig, **kwargs) -> Sig:
        from ..parallel import seqpar
        assert ceps.hop == self.hop_length
        n_fft = self.n_fft
        env = seqpar.current()
        c = (seqpar.localize_frames(ceps, env).data
             if env is not None else ceps.data)
        # pad: zeros to n_fft//2+1 then reflect interior to full n_fft
        c = jnp.pad(
            c, ((0, 0), (0, 0), (0, n_fft // 2 - self.filter_order)))
        c = jnp.pad(c, ((0, 0), (0, 0), (0, n_fft // 2 - 1)), mode="reflect")
        log_mag = jnp.fft.fft(c, axis=-1).real        # (B, F, n_fft)

        if self.phase == "zero":
            h = jnp.exp(log_mag).astype(jnp.complex64)
        else:
            min_phase = -hilbert(log_mag, axis=-1).imag
            h = jnp.exp(log_mag + 1j * min_phase)
        if env is not None:
            y = seqpar.stft_filter_sharded(
                ex.data, h, n_fft, self.hop_length, self.window, env,
                onesided=False)
            return Sig(y, 1)
        h = jnp.swapaxes(h, 1, 2)                     # (B, n_fft, F)

        spec = stft_ops.stft(ex.data, n_fft, self.hop_length,
                             window=self.window, center=True, onesided=False)
        f = min(spec.shape[-1], h.shape[-1])
        out = stft_ops.istft(spec[..., :f] * h[..., :f], n_fft,
                             self.hop_length, window=self.window,
                             center=True, onesided=False)
        return Sig(out.real if jnp.iscomplexobj(out) else out, 1)


class LTVAPFilter(LTVMLSAFilter):
    """Aperiodicity via MLSA: ctrl = mcep(sigmoid(x)) (reference
    :687-714)."""

    n_mag: int = 257

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.n_mag,)

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        mc = mcep(jax.nn.sigmoid(x.data), self.filter_order, self.alpha)
        return (Sig(mc, x.hop),)

    phase: str = "zero"


class DiffWorldSPFilter(LTVFilterInterface):
    """∇WORLD spectral-envelope filter (reference :717-760): mel bins ->
    pinv(mel fbank) -> sqrt spectral envelope -> one-sided STFT multiply."""

    n_mels: int = 80
    n_fft: int = 1024
    hop_length: int = 240
    f_min: float = 0.0
    f_max: float = 12000.0
    sample_rate: int = 24000
    center: bool = True
    window: str = "hanning"

    def setup(self):
        fb = stft_ops.melscale_fbanks(
            self.n_fft // 2 + 1, self.f_min, self.f_max, self.n_mels,
            self.sample_rate)
        inv_fb = np.linalg.pinv(fb)
        self._fb = jnp.asarray(np.maximum(inv_fb, 0.0), jnp.float32)

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        return (self.n_mels,)

    def ctrl(self, x: Sig) -> Tuple[Sig, ...]:
        return (Sig(jnp.exp(x.data), x.hop),)

    def __call__(self, ex: Sig, mel_sp: Sig) -> Sig:
        from ..parallel import seqpar
        assert mel_sp.hop == self.hop_length
        env = seqpar.current()
        if env is not None:
            assert self.center, "sharded DiffWorldSPFilter needs center"
            sp_l = seqpar.localize_frames(mel_sp, env).data @ self._fb
            sp_l = jnp.sqrt(jnp.maximum(sp_l, 0.0))   # (B, F_loc, bins)
            y = seqpar.stft_filter_sharded(
                ex.data, sp_l, self.n_fft, self.hop_length, self.window,
                env, onesided=True)
            return Sig(y, 1)
        sp = mel_sp.data @ self._fb                   # (B, F, bins)
        sp = jnp.swapaxes(jnp.sqrt(jnp.maximum(sp, 0.0)), 1, 2)
        spec = stft_ops.stft(ex.data, self.n_fft, self.hop_length,
                             window=self.window, center=self.center)
        f = min(spec.shape[-1], sp.shape[-1])
        out = stft_ops.istft(spec[..., :f] * sp[..., :f], self.n_fft,
                             self.hop_length, window=self.window,
                             center=self.center)
        return Sig(out, 1)
