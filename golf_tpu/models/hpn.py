"""Harmonic-plus-noise synthesizer — the DDSP / SawSing / NHV topology.

Reference ``models/hpn.py``: harmonic branch -> harm_filter, noise branch ->
noise_filter, sum -> LTI end_filter. Voicing multiplies the *phase* (not the
waveform).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn

from ..core.sig import Sig
from .ctrl import PassThrough, Synth
from .filters import FilterInterface, LTVFilterInterface
from .noise import NoiseInterface
from .synth import OscillatorInterface


class HarmonicPlusNoiseSynth(Synth):
    harm_oscillator: OscillatorInterface
    noise_generator: NoiseInterface
    harm_filter: Union[LTVFilterInterface, PassThrough]
    noise_filter: Union[LTVFilterInterface, PassThrough]
    end_filter: Union[FilterInterface, PassThrough]

    @property
    def ctrl_names(self) -> Tuple[str, ...]:
        return ("harm_oscillator", "noise_generator", "harm_filter",
                "noise_filter", "end_filter")

    def __call__(
        self,
        phase: Sig,
        harm_oscillator_params: Tuple[Sig, ...] = (),
        noise_generator_params: Tuple[Sig, ...] = (),
        harm_filter_params: Tuple[Sig, ...] = (),
        noise_filter_params: Tuple[Sig, ...] = (),
        end_filter_params: Tuple[Sig, ...] = (),
        voicing: Optional[Sig] = None,
        **other_params,
    ) -> Sig:
        if voicing is not None:
            phase = phase * voicing

        harm_osc = self.harm_oscillator(phase, *harm_oscillator_params)
        noise = self.noise_generator(harm_osc, *noise_generator_params)

        harm_osc = self.harm_filter(harm_osc, *harm_filter_params)
        noise = self.noise_filter(noise, *noise_filter_params)

        out = harm_osc + noise
        return self.end_filter(out, *end_filter_params)
