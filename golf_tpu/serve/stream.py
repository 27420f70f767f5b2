"""Stateful chunked streaming synthesis for the GOLF source-filter chain.

A serving capability the reference does not have (its closest analog is
the offline chunked-OLA predict path, ``ltng/vocoder.py``): synthesize an
UNBOUNDED stream chunk-by-chunk with constant memory, one jitted dispatch
per chunk, and output that matches the one-shot offline decoder on every
emitted sample (fp-exactly for the finite-memory stages, to fp drift
~1 ulp/chunk for the phase accumulator).

Design — hybrid overlap-save + exact state:

* finite-memory stages (wavetable lookup, oversampled decimation FIR,
  zero-phase noise-shaping frame conv) are recomputed on a sliding
  [prev | cur | next] chunk window and only the central chunk is emitted —
  every FIR/OLA reach stays inside the window, so central samples equal
  the offline values exactly;
* the two unbounded-memory pieces carry explicit state: the WRAPPED
  phase accumulator (mod-1; ``ops.dsp.wrapped_cumsum``'s T-independent
  conditioning keeps fp32 phase accurate for arbitrarily long streams)
  and the order-p all-pole filter state
  (``ops.allpole.allpole_stream``: the last p outputs);
* the strictly-causal LTI room filter carries a (length-1)-sample input
  tail.

Emission schedule: chunk c is emitted on push c+2 (the window needs the
next chunk, and the wavetable row interpolation needs one ctrl row of
lookahead beyond it) — algorithmic latency is 2 chunks (200 ms at the
minimum chunk of 2400 samples @ 24 kHz). ``flush`` drains the final two
chunks with edge-held ctrl rows and safe phase padding; samples past the
offline decoder's output support are edge-padded values.

Supported topology (the GOLF flagship, ``cfg/ae/decoder/golf-precise``):
``SourceFilterSynth`` with a GlottalFlowTable-family harmonic oscillator
(anything accepting ``phase_offset``), an LTV FIR noise filter, the
sample-wise ``LTVMinimumPhaseFilterPrecise`` end filter and an optional
``LTIAcousticFilter`` room filter. Reference chain semantics:
``/root/reference/models/sf.py`` + ``models/filters.py:64-113``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sig import Sig
from ..ops.allpole import allpole_stream

_BUF_KEYS = ("phase", "noise", "tw", "nf", "gain", "lpc")


class GOLFStream:
    """Streaming synthesizer: one instance per stream (or per batch of
    lock-step streams).

    Per chunk the caller pushes:
      * ``ctrl``: the decoder's APPLIED ctrl params for the chunk
        (``decoder.apply_ctrl`` output sliced to the chunk's frame rows) —
        harm table weights (hop ``table_hop``), noise-filter log-mag rows
        and end-filter (gain, lpc) rows (hop ``hop``);
      * ``phase``: (B, chunk) per-sample normalized frequency (f0/sr);
      * ``noise``: optional (B, chunk) noise field — defaults to a
        ``fold_in(key, chunk_index)`` standard-normal draw.
    ``push`` returns the synthesized (B, chunk) audio for chunk
    ``pushes-3``, or ``None`` for the first two pushes.
    """

    def __init__(self, decoder, variables, chunk: int = 2400,
                 key: Optional[jax.Array] = None, hop: int = 240):
        self.decoder = decoder
        self.variables = variables
        self.chunk = chunk
        self.key = jax.random.key(0) if key is None else key
        self.hop = hop

        osc = decoder.harm_oscillator
        self.oversampling = getattr(osc, "oversampling", 1)
        hop_rate = getattr(osc, "hop_rate", 1)
        self.table_hop = hop * hop_rate
        assert chunk % self.table_hop == 0 and chunk % hop == 0, (
            f"chunk must be a multiple of the table ctrl hop "
            f"{self.table_hop}")
        self.p = decoder.end_filter.lpc_order
        room = decoder.room_filter
        self.room_len = getattr(room, "length", 1) if room is not None else 1
        assert chunk > max(self.p, self.room_len)
        assert not decoder.subtract_harmonics or \
            decoder.noise_filter is not None

        self._bufs: Dict[str, list] = {k: [] for k in _BUF_KEYS}
        self._base = 0          # chunk index of _bufs[*][0]
        self._tail: Dict[str, jax.Array] = {}   # leftover ctrl rows
        self._state = None
        self._n_pushed = 0
        self._emitted = 0
        self._steps = {True: jax.jit(self._make_step(first=True)),
                       False: jax.jit(self._make_step(first=False))}

    # ------------------------------------------------------------------
    def _make_step(self, first: bool):
        """The jitted window step. ``first``: window = [cur | next]
        (central = chunk 0; the window's left edge IS the stream start, so
        the modules' own zero-pad edge handling reproduces the offline
        signal start). Otherwise window = [prev | cur | next], central in
        the middle."""
        dec = self.decoder
        c = self.chunk
        central0 = 0 if first else c
        k_os = self.oversampling
        hop = self.hop
        room_l = self.room_len

        # ``variables`` is a step argument, NOT a closure: closed-over
        # arrays embed as jit constants, and a constant glottal wavetable
        # triggers a pathological XLA lowering of the bilinear lookup
        # (see models/synth.py GlottalFlowTable).
        def step(variables, phase_w, noise_w, tw_rows, nf_rows, gain_rows,
                 lpc_rows, phase_offset, zi, room_tail):
            def apply(fn, *args):
                return dec.apply(variables, *args,
                                 rngs={"noise": jax.random.key(0)},
                                 method=fn)
            # --- harmonic source over the window (module path: wrapped
            # phase integration + wavetable + equal-energy + decimation),
            # continued mid-stream via phase_offset ------------------------
            off = None if first else Sig(phase_offset[:, None], 1)
            harm = apply(
                lambda m, p_, w_: m.harm_oscillator(
                    p_, w_, phase_offset=off),
                Sig(phase_w, 1), Sig(tw_rows, self.table_hop))

            # --- noise branch over the window -----------------------------
            nf = apply(lambda m, n_, k_: m.noise_filter(n_, k_),
                       Sig(noise_w, 1), Sig(nf_rows, hop))
            t_mix = min(harm.data.shape[1], nf.data.shape[1])
            src = harm.data[:, :t_mix] + nf.data[:, :t_mix]
            if dec.subtract_harmonics:
                hf = apply(lambda m, h_, k_: m.noise_filter(h_, k_),
                           Sig(harm.data, 1), Sig(nf_rows, hop))
                src = src - hf.data[:, :t_mix]

            # --- central chunk through the stateful all-pole ---------------
            # mirrors LTVMinimumPhaseFilterPrecise.__call__: gain and
            # coefficients hop-upsampled (align-corners linear); slice the
            # central chunk out of the window-positional upsample
            gain_up = Sig(gain_rows, hop).reduce_hop_length().data
            a_up = Sig(lpc_rows, hop).reduce_hop_length().data
            tt = min(t_mix, gain_up.shape[1], a_up.shape[1])
            assert tt >= central0 + c, (tt, central0, c)
            x_c = (src[:, :tt] * gain_up[:, :tt])[:, central0:central0 + c]
            a_c = a_up[:, central0:central0 + c]
            y, zi_next = allpole_stream(x_c, a_c, zi)

            # --- causal room filter with carried input tail ----------------
            if dec.room_filter is not None and room_l > 1:
                ext = jnp.concatenate([room_tail, y], axis=1)
                out = apply(lambda m, e_: m.room_filter(e_), Sig(ext, 1))
                audio = out.data[:, room_l - 1:]
                room_tail_next = ext[:, -(room_l - 1):]
            else:
                audio = y
                room_tail_next = room_tail

            # --- advance the wrapped-phase accumulator ---------------------
            # window starts: chunk 0 and chunk 1 windows BOTH start at
            # global sample 0 (the first window has no prev chunk), so the
            # first step leaves the offset at 0; afterwards the next window
            # starts one chunk later and the offset advances by the window's
            # first chunk of increments — exactly what the oscillator
            # integrates (phase / oversampling at the oversampled rate).
            if first:
                return audio, zi_next, room_tail_next, phase_offset
            if k_os > 1:
                inc = Sig(phase_w / k_os, k_os).reduce_hop_length().data
            else:
                inc = phase_w
            adv = jnp.sum(inc[:, :c * k_os], axis=1)
            off_next = (phase_offset + adv) % 1
            return audio, zi_next, room_tail_next, off_next

        return step

    # ------------------------------------------------------------------
    def _init_state(self, b: int):
        return {
            "offset": jnp.zeros((b,), jnp.float32),
            "zi": jnp.zeros((b, self.p), jnp.float32),
            "room_tail": jnp.zeros((b, max(self.room_len - 1, 1)),
                                   jnp.float32),
        }

    def push(self, ctrl: Dict[str, Tuple[Sig, ...]], phase: jax.Array,
             noise: Optional[jax.Array] = None) -> Optional[np.ndarray]:
        assert "voicing" not in ctrl, (
            "voicing-gated streaming is not supported yet — gate the "
            "harmonic branch upstream (zero the phase in unvoiced "
            "regions) or use the offline decoder")
        b = phase.shape[0]
        if self._state is None:
            self._state = self._init_state(b)
        if noise is None:
            noise = jax.random.normal(
                jax.random.fold_in(self.key, self._n_pushed),
                (b, self.chunk), jnp.float32)
        self._append(phase=jnp.asarray(phase), noise=jnp.asarray(noise),
                     tw=ctrl["harm_oscillator_params"][0].data,
                     nf=ctrl["noise_filter_params"][0].data,
                     gain=ctrl["end_filter_params"][0].data,
                     lpc=ctrl["end_filter_params"][1].data)
        self._n_pushed += 1
        if self._n_pushed < 3:
            return None
        return self._emit()

    def _append(self, **chunks):
        for k, v in chunks.items():
            self._bufs[k].append(v)

    def _buf(self, k: str, idx: int):
        return self._bufs[k][idx - self._base]

    def _emit(self) -> np.ndarray:
        c_idx = self._emitted
        first = c_idx == 0
        lo = c_idx if first else c_idx - 1
        n = self._base + len(self._bufs["phase"])

        def cat(k):
            return jnp.concatenate(
                [self._buf(k, i) for i in range(lo, c_idx + 2)], axis=1)

        phase_w, noise_w = cat("phase"), cat("noise")
        nf_w, gain_w, lpc_w = cat("nf"), cat("gain"), cat("lpc")
        # wavetable rows + one interp-lookahead row: the first row of
        # chunk c+2 while streaming; at stream end the flush-provided
        # leftover ctrl rows (ctrl frame counts generally exceed
        # T/hop — e.g. the Downsampler's torch-AvgPool edge padding
        # yields one extra table row that the offline lookup consumes as
        # the final block's interpolation target), else edge-hold.
        if c_idx + 2 < n:
            extra = self._buf("tw", c_idx + 2)[:, :1]
        elif "tw" in self._tail:
            extra = self._tail["tw"][:, :1]
        else:
            extra = self._buf("tw", n - 1)[:, -1:]
        tw_w = jnp.concatenate([cat("tw"), extra], axis=1)

        st = self._state
        audio, zi, room_tail, off = self._steps[first](
            self.variables, phase_w, noise_w, tw_w, nf_w, gain_w, lpc_w,
            st["offset"], st["zi"], st["room_tail"])
        self._state = {"offset": off, "zi": zi, "room_tail": room_tail}
        self._emitted += 1
        # the next emit (chunk c_idx+1) needs chunks >= c_idx: drop older
        while self._base < self._emitted - 1:
            for k in _BUF_KEYS:
                self._bufs[k].pop(0)
            self._base += 1
        return np.asarray(audio)

    def flush(self, tail_ctrl: Optional[Dict[str, Tuple[Sig, ...]]] = None
              ) -> np.ndarray:
        """Drain the two pending chunks.

        ``tail_ctrl``: leftover ctrl rows past the last full chunk — ctrl
        frame counts generally exceed T/hop (the table-weight Downsampler's
        torch-AvgPool edge padding adds a row; encoders may emit T/hop + 1
        frames). The offline decoder consumes them as the final blocks'
        interpolation targets, so the stream needs them for sample-exact
        tails. Missing kinds are edge-held. Emitted samples past the
        offline decoder's output support are edge-padded values (the
        offline decoder does not produce them at all)."""
        if tail_ctrl:
            for k, sigkey, i in (("tw", "harm_oscillator_params", 0),
                                 ("nf", "noise_filter_params", 0),
                                 ("gain", "end_filter_params", 0),
                                 ("lpc", "end_filter_params", 1)):
                if sigkey in tail_ctrl and len(tail_ctrl[sigkey]) > i:
                    self._tail[k] = tail_ctrl[sigkey][i].data
        if self._n_pushed == 0 or self._emitted >= self._n_pushed:
            return np.zeros((1, 0), np.float32)
        outs = []
        if self._emitted < self._n_pushed - 1:
            outs.append(self._emit())        # chunk N-2: all inputs real
        # chunk N-1: append a virtual next chunk made of the tail ctrl
        # rows (edge-held past them). Phase is EDGE-HELD, not an arbitrary
        # constant: equal-energy scales the source by rsqrt(phase), so a
        # small pad phase would make the pad region far louder than the
        # signal and its fp error — spread window-wide by the FFT
        # decimator — would swamp the final chunk.
        b = self._bufs["phase"][0].shape[0]

        def pad_rows(k):
            last = self._bufs[k][-1]
            rows = self._tail.get(k, last[:, :0])
            rpc = last.shape[1]
            if rows.shape[1] < rpc:
                hold = (rows[:, -1:] if rows.shape[1] else last[:, -1:])
                rows = jnp.concatenate(
                    [rows] + [hold] * (rpc - rows.shape[1]), axis=1)
            return rows[:, :rpc]

        self._append(
            phase=jnp.repeat(self._bufs["phase"][-1][:, -1:],
                             self.chunk, axis=1),
            noise=jnp.zeros((b, self.chunk), jnp.float32),
            **{k: pad_rows(k) for k in ("tw", "nf", "gain", "lpc")})
        outs.append(self._emit())
        return np.concatenate(outs, axis=1)
