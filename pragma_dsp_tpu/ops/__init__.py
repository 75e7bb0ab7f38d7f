"""Performance ops layer: Pallas kernels, MXU FFTs, dispatch, DSP blocks."""

from .dispatch import fft, get_fft_impl, ifft, set_fft_impl
from .fft_fourstep import fft_fourstep, ifft_fourstep
from .fft_pallas import (
    fft_pallas,
    fft_pallas_permuted,
    ifft_pallas,
    ifft_pallas_from_permuted,
    spectrum_amplitude_pallas,
)

__all__ = [
    "fft",
    "ifft",
    "set_fft_impl",
    "get_fft_impl",
    "fft_fourstep",
    "ifft_fourstep",
    "fft_pallas",
    "ifft_pallas",
    "fft_pallas_permuted",
    "ifft_pallas_from_permuted",
    "spectrum_amplitude_pallas",
]
