"""FFT implementation dispatch: pick the fastest correct path per backend.

Three interchangeable implementations, all locked to the numpy convention
and validated against the same fixtures:

* ``stockham`` — pure jnp recursion (core/fft.py). Works on every
  backend and dtype (incl. f64 on CPU); the correctness reference.
* ``fourstep`` — jnp MXU formulation (ops/fft_fourstep.py). Fast on TPU,
  several fused XLA kernels.
* ``pallas``  — single fused kernel (ops/fft_pallas.py). Fastest on TPU
  (measured ~1.5x over fourstep at N=1024); interpreter mode elsewhere.

Default policy: pallas on TPU for f32/bf16 power-of-two sizes > 128,
fourstep for smaller TPU transforms (they are a single matmul anyway),
stockham otherwise. Override globally with :func:`set_fft_impl` or
per call via ``impl=``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.complex import ComplexArray, as_complex_array
from ..core.fft import fft as _fft_stockham, ifft as _ifft_stockham
from .fft_fourstep import fft_fourstep, ifft_fourstep
from .fft_pallas import fft_pallas, ifft_pallas

__all__ = ["fft", "ifft", "set_fft_impl", "get_fft_impl"]

_IMPLS = ("auto", "stockham", "fourstep", "pallas")
_impl = "auto"


def set_fft_impl(impl: str) -> None:
    """Globally select the FFT implementation ('auto' restores policy)."""
    global _impl
    if impl not in _IMPLS:
        raise ValueError(f"unknown fft impl {impl!r}; choose from {_IMPLS}")
    _impl = impl


def get_fft_impl() -> str:
    return _impl


def _resolve(xc: ComplexArray, axis: int) -> str:
    if _impl != "auto":
        return _impl
    if jax.default_backend() != "tpu":
        return "stockham"
    if xc.real.dtype not in (jnp.float32, jnp.bfloat16):
        return "stockham"
    n = xc.real.shape[axis]
    if n > 128 and axis in (-1, xc.real.ndim - 1):
        return "pallas"
    return "fourstep"


def fft(x, axis: int = -1, impl: Optional[str] = None,
        precision: str = "highest") -> ComplexArray:
    """Forward FFT (numpy convention, unnormalised) via the best backend path.

    ``precision`` ("highest" | "bf16x3") applies to the pallas path only
    (the other impls are already full-f32); see ops/fft_pallas.py.
    """
    xc = as_complex_array(x)
    chosen = impl if impl is not None else _resolve(xc, axis)
    if chosen == "pallas":
        return fft_pallas(xc, axis, precision=precision)
    if chosen == "fourstep":
        return fft_fourstep(xc, axis)
    return _fft_stockham(xc, axis)


def ifft(x, axis: int = -1, impl: Optional[str] = None,
         precision: str = "highest") -> ComplexArray:
    """Inverse FFT with 1/N normalisation via the best backend path."""
    xc = as_complex_array(x)
    chosen = impl if impl is not None else _resolve(xc, axis)
    if chosen == "pallas":
        return ifft_pallas(xc, axis, precision=precision)
    if chosen == "fourstep":
        return ifft_fourstep(xc, axis)
    return _ifft_stockham(xc, axis)
