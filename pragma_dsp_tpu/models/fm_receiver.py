"""Wideband-FM broadcast receiver chain (BASELINE.json config 4).

IQ at ``iq_rate`` (e.g. 2.4 Msps) -> channel lowpass + decimate to
``if_rate`` -> quadrature discriminator -> de-emphasis -> resample to
``audio_rate``. Every stage is a batched jit-compilable array op; the
whole chain compiles to one XLA program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.complex import Array, ComplexArray, as_complex_array
from ..ops.demod import deemphasis, fm_discriminate
from ..ops.polyphase import design_lowpass, resample_poly, upfirdn

__all__ = ["FmReceiverConfig", "FmReceiver", "wbfm_demod"]


@dataclass(frozen=True)
class FmReceiverConfig:
    iq_rate: float = 2.4e6
    if_rate: float = 240e3          # post-channel-filter rate
    audio_rate: float = 48e3
    deviation: float = 75e3         # broadcast FM
    channel_taps: int = 127
    audio_taps: int = 127
    deemphasis_tau: Optional[float] = 75e-6

    def __post_init__(self):
        if self.iq_rate % self.if_rate != 0:
            raise ValueError("iq_rate must be an integer multiple of if_rate")


class FmReceiver:
    """Config-driven WBFM receiver; call with IQ [..., L]."""

    def __init__(self, config: FmReceiverConfig = FmReceiverConfig()):
        self.config = config
        c = config
        self._decim1 = int(c.iq_rate // c.if_rate)
        # Channel filter: keep ~200 kHz FM channel, cutoff at new Nyquist.
        self._chan_taps = design_lowpass(c.channel_taps, 1.0 / self._decim1)
        frac = c.audio_rate / c.if_rate
        g = math.gcd(int(c.audio_rate), int(c.if_rate))
        self._up = int(c.audio_rate) // g
        self._down = int(c.if_rate) // g
        audio_cut = min(1.0 / self._up, 1.0 / self._down)
        self._audio_taps = design_lowpass(
            c.audio_taps * max(1, self._up), audio_cut) * self._up

    def __call__(self, iq) -> Array:
        c = self.config
        xc = as_complex_array(iq)
        # 1. channel select: lowpass + decimate in one polyphase pass
        chan = upfirdn(xc, jnp.asarray(self._chan_taps), 1, self._decim1)
        # 2. discriminator -> baseband audio at if_rate, normalised
        audio_if = fm_discriminate(chan, sample_rate=c.if_rate,
                                   deviation=c.deviation)
        # 3. de-emphasis
        if c.deemphasis_tau is not None:
            audio_if = deemphasis(audio_if, c.if_rate, c.deemphasis_tau)
        # 4. resample to audio rate
        audio = upfirdn(audio_if, jnp.asarray(self._audio_taps),
                        self._up, self._down)
        return audio


def wbfm_demod(iq, iq_rate: float = 2.4e6, audio_rate: float = 48e3,
               deviation: float = 75e3) -> Array:
    """One-call WBFM demodulation with default chain parameters."""
    cfg = FmReceiverConfig(iq_rate=iq_rate, audio_rate=audio_rate,
                           deviation=deviation)
    return FmReceiver(cfg)(iq)
