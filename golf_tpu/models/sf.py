"""Source-filter synthesizer composition — the GOLF topology.

Reference ``models/sf.py``: glottal source x gain, plus filtered noise
(optional subtract-harmonics leakage correction), through the time-varying
all-pole ``end_filter`` and an LTI ``room_filter``. Voicing hard-gates the
harmonic branch (threshold at 0.5). Inverse mode runs the *target* through
the inverse FIR so the loss lives in the excitation domain.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..core.sig import Sig, sig_where
from .ctrl import PassThrough, Synth
from .filters import FilterInterface, LTVFilterInterface
from .noise import NoiseInterface
from .synth import OscillatorInterface


class SourceFilterSynth(Synth):
    harm_oscillator: OscillatorInterface
    noise_generator: NoiseInterface
    noise_filter: Union[LTVFilterInterface, PassThrough]
    end_filter: Union[LTVFilterInterface, PassThrough]
    room_filter: Optional[Union[FilterInterface, PassThrough]] = None
    subtract_harmonics: bool = True

    @property
    def ctrl_names(self) -> Tuple[str, ...]:
        return ("harm_oscillator", "noise_generator", "noise_filter",
                "end_filter", "room_filter")

    def _ctrl_children(self):
        children = [("harm_oscillator", self.harm_oscillator),
                    ("noise_generator", self.noise_generator),
                    ("noise_filter", self.noise_filter),
                    ("end_filter", self.end_filter)]
        if self.room_filter is not None:
            children.append(("room_filter", self.room_filter))
        return children

    def __call__(
        self,
        phase: Sig,
        harm_oscillator_params: Tuple[Sig, ...] = (),
        noise_generator_params: Tuple[Sig, ...] = (),
        noise_filter_params: Tuple[Sig, ...] = (),
        end_filter_params: Tuple[Sig, ...] = (),
        room_filter_params: Tuple[Sig, ...] = (),
        voicing: Optional[Sig] = None,
        target: Optional[Sig] = None,
        **other_params,
    ):
        harm_osc = self.harm_oscillator(phase, *harm_oscillator_params)
        if voicing is not None:
            # F.threshold(v, 0.5, 0): keep v where v > 0.5 else 0
            from ..parallel import seqpar
            env = seqpar.current()
            if env is not None and voicing.hop > 1:
                voicing = seqpar.localize(voicing, env, 1)
            gate = sig_where(voicing > 0.5, voicing, 0.0)
            harm_osc = harm_osc * gate

        noise = self.noise_generator(harm_osc, *noise_generator_params)
        src = harm_osc + self.noise_filter(noise, *noise_filter_params)

        if self.subtract_harmonics:
            src = src - self.noise_filter(harm_osc, *noise_filter_params)

        if target is not None:
            src, target_src = self.end_filter.reverse(
                src, target, *end_filter_params)
            return src, target_src
        out = self.end_filter(src, *end_filter_params)
        if self.room_filter is None:
            return out
        return self.room_filter(out, *room_filter_params)
