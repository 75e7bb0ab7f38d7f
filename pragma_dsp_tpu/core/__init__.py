"""Core layer — split-complex representation + batched radix-2 FFT.

The expert rung of the API ladder (reference src/core/index.ts:3).
"""

from .complex import (
    ComplexArray,
    as_complex_array,
    create_complex_array,
    is_power_of_two,
    next_power_of_two,
)
from .fft import Radix2Fft, fft, fft_axis0, ifft

__all__ = [
    "ComplexArray",
    "as_complex_array",
    "create_complex_array",
    "is_power_of_two",
    "next_power_of_two",
    "Radix2Fft",
    "fft",
    "fft_axis0",
    "ifft",
]
