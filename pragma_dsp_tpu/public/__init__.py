"""Beginner rung — the one-call spectrum pipeline (reference src/public/)."""

from .spectrum import (
    SpectrumPeak,
    SpectrumResult,
    spectrum,
)

__all__ = ["SpectrumPeak", "SpectrumResult", "spectrum"]
