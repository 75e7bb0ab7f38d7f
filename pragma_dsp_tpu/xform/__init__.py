"""Power rung — Fourier transforms, windows, and projections
(reference src/xform/index.ts)."""

from .fourier import (
    FFT,
    coherent_gain,
    enbw,
    FftSides,
    WindowType,
    apply_window,
    bin_frequencies,
    create_window,
    fft_shift,
    fft_shift_complex,
    magnitude,
    phase,
)
from .fluent import FluentFFT

__all__ = [
    "FFT",
    "FftSides",
    "WindowType",
    "apply_window",
    "bin_frequencies",
    "create_window",
    "coherent_gain",
    "enbw",
    "fft_shift",
    "fft_shift_complex",
    "magnitude",
    "phase",
    "FluentFFT",
]
