"""Large single-chip FFT: two fused Pallas kernels, permuted end-to-end.

The jnp four-step path costs ~6 HBM-pass-equivalents at N = 2^20 (its
column stage lowers to several XLA kernels with round trips between
them).  Here N = n2b * n1b is viewed as (n2b, n1b) and runs as exactly
TWO fused kernels (ops/fft_pallas.py):

1. the COLUMN kernel — stage-1 sub-FFTs over the n2b (sublane) axis,
   with the inter-stage twiddle grid W_N^{k2*n1} FOLDED into its output
   store (one streamed constant read, no separate twiddle pass);
2. the ROW kernel — stage-2 sub-FFTs over the n1b (lane) axis, chained
   through donated buffers.

Total HBM traffic: in + mid + mid + out + twiddle grid = 2.5
pass-equivalents.  Nothing un-permutes between or after the stages: the
production contract is permuted digit order end-to-end (the same design
decision as the per-row kernels and parallel/dist_fft — BASELINE.md),
and fft -> pointwise -> ifft round trips never pay a transpose.
Natural-order wrappers restore ordering with XLA transposes only when
asked (the correctness path for the public ops.fft at huge N).

Forward output layout (shape [..., n2b, n1b], numpy convention,
scripts/gen_fixtures.py:12-14): element [p, q] holds X[k2 + n2b*k1]
with k2 = (p // 128) + (n2b // 128) * (p % 128) (column-kernel sublane
permutation) and k1 = (q // 128) + (n1b // 128) * (q % 128)
(row-kernel lane permutation).  The reference has no long-transform
counterpart (largest tested N is 4096); the contract this satisfies is
BASELINE.json's north-star 1M-point workload.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.complex import Array, ComplexArray, as_complex_array, \
    is_power_of_two
from .fft_pallas import (LANES, MAX_COLS_N, MAX_ROWS_N,
                         fft_pallas_cols_permuted,
                         fft_pallas_permuted, ifft_pallas_cols_from_permuted,
                         ifft_pallas_from_permuted)

__all__ = ["fft_big_permuted", "ifft_big_from_permuted", "big_split",
           "big_permuted_to_natural", "natural_to_big_permuted",
           "fft_big", "ifft_big", "MIN_BIG_N"]

# Smallest N the two-kernel path covers: both factors must exceed the
# 128-lane tile for the plane-structured kernels. The upper bound is
# MAX_COLS_N * MAX_ROWS_N (shared constants — ops.dispatch routes only
# inside this range).
MIN_BIG_N = (2 * LANES) * (2 * LANES)


def big_split(n: int) -> Tuple[int, int]:
    """(n2b, n1b) factorisation: near-balanced, n2b capped at the column
    kernel's MAX_COLS_N, n1b at the row kernel's practical maximum."""
    if not is_power_of_two(n) or n < MIN_BIG_N:
        raise ValueError(
            f"big FFT size must be a power of two >= {MIN_BIG_N}, got {n}")
    bits = n.bit_length() - 1
    n1 = 1 << ((bits + 1) // 2)
    n2 = n // n1
    while n2 > MAX_COLS_N:
        n2 //= 2
        n1 *= 2
    if n1 > MAX_ROWS_N or n2 <= LANES:
        raise ValueError(f"n={n} outside the two-kernel range "
                         f"(n2b={n2}, n1b={n1})")
    return n2, n1


@functools.lru_cache(maxsize=16)
def _interstage_grids(n2b: int, n1b: int,
                      sign: float) -> Tuple[np.ndarray, np.ndarray]:
    """Inter-stage twiddle W_N^{sign*k2*n1} as (n2b, n1b) f32 cos/sin
    grids in the column kernel's PERMUTED sublane layout (row p holds
    k2 = p//128 + (n2b//128)*(p%128)).  The phase k2*n1 is reduced mod N
    in exact int64 arithmetic before the f64 trig (k2*n1 reaches ~1e12
    at N = 2^20, where raw f64 angles would carry ~1e-10 rounding).
    Numpy only — this cache can be hit inside a jit trace."""
    n = n2b * n1b
    r2 = n2b // LANES
    p = np.arange(n2b, dtype=np.int64)
    k2 = (p // LANES) + r2 * (p % LANES)
    n1 = np.arange(n1b, dtype=np.int64)
    phase = (k2[:, None] * n1[None, :]) % n
    ang = sign * 2.0 * np.pi * phase.astype(np.float64) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def fft_big_permuted(x, interpret: Optional[bool] = None,
                     precision: Optional[str] = None,
                     donate: bool = False) -> ComplexArray:
    """Forward FFT of [..., n] (n >= MIN_BIG_N), permuted output
    [..., n2b, n1b] (layout in the module docstring).  ``donate``
    aliases x's buffers into stage 1; stage 1 -> 2 always donates."""
    xc = as_complex_array(x)
    n = xc.real.shape[-1]
    n2b, n1b = big_split(n)
    lead = xc.real.shape[:-1]
    view = ComplexArray(xc.real.reshape(lead + (n2b, n1b)),
                        xc.imag.reshape(lead + (n2b, n1b)))
    grids = _interstage_grids(n2b, n1b, -1.0)
    s1 = fft_pallas_cols_permuted(view, interpret=interpret,
                                  precision=precision, donate=donate,
                                  fold_grids=grids)
    s2 = fft_pallas_permuted(s1, axis=-1, interpret=interpret,
                             precision=precision, donate=True)
    return ComplexArray(s2.real.reshape(lead + (n2b, n1b)),
                        s2.imag.reshape(lead + (n2b, n1b)))


def ifft_big_from_permuted(p, interpret: Optional[bool] = None,
                           precision: Optional[str] = None,
                           donate: bool = False) -> ComplexArray:
    """Inverse FFT consuming the permuted [..., n2b, n1b] layout,
    emitting natural time order [..., n], 1/N normalised."""
    pc = as_complex_array(p)
    n2b, n1b = pc.real.shape[-2:]
    lead = pc.real.shape[:-2]
    r1 = n1b // LANES
    rows = ComplexArray(pc.real.reshape(lead + (n2b, r1, LANES)),
                        pc.imag.reshape(lead + (n2b, r1, LANES)))
    s1 = ifft_pallas_from_permuted(rows, n1b, interpret=interpret,
                                   precision=precision, donate=donate)
    grids = _interstage_grids(n2b, n1b, 1.0)
    out = ifft_pallas_cols_from_permuted(s1, interpret=interpret,
                                         precision=precision, donate=True,
                                         fold_grids=grids)
    return ComplexArray(out.real.reshape(lead + (n2b * n1b,)),
                        out.imag.reshape(lead + (n2b * n1b,)))


def big_permuted_to_natural(x: Array, n2b: int, n1b: int) -> Array:
    """Permuted [..., n2b, n1b] plane -> natural [..., N] bin order
    (three XLA transposes — test/interop path, not the production
    contract)."""
    lead = x.shape[:-2]
    nd = len(lead)
    r2, r1 = n2b // LANES, n1b // LANES
    v = x.reshape(lead + (r2, LANES, r1, LANES))
    perm = tuple(range(nd)) + (nd + 1, nd, nd + 3, nd + 2)
    a = jnp.transpose(v, perm).reshape(lead + (n2b, n1b))   # A[k2, k1]
    return jnp.swapaxes(a, -2, -1).reshape(lead + (n2b * n1b,))


def natural_to_big_permuted(x: Array, n2b: int, n1b: int) -> Array:
    """Natural [..., N] bin order -> permuted [..., n2b, n1b] plane
    (inverse of :func:`big_permuted_to_natural`)."""
    lead = x.shape[:-1]
    nd = len(lead)
    r2, r1 = n2b // LANES, n1b // LANES
    a = jnp.swapaxes(x.reshape(lead + (n1b, n2b)), -2, -1)  # A[k2, k1]
    v = a.reshape(lead + (LANES, r2, LANES, r1))
    perm = tuple(range(nd)) + (nd + 1, nd, nd + 3, nd + 2)
    return jnp.transpose(v, perm).reshape(lead + (n2b, n1b))


def fft_big(x, interpret: Optional[bool] = None,
            precision: Optional[str] = None,
            donate: bool = False) -> ComplexArray:
    """Forward FFT of [..., n], natural bin order (pays the restoration
    transposes; production pipelines use :func:`fft_big_permuted`)."""
    p = fft_big_permuted(x, interpret, precision, donate)
    n2b, n1b = p.real.shape[-2:]
    return ComplexArray(big_permuted_to_natural(p.real, n2b, n1b),
                        big_permuted_to_natural(p.imag, n2b, n1b))


def ifft_big(x, interpret: Optional[bool] = None,
             precision: Optional[str] = None,
             donate: bool = False) -> ComplexArray:
    """Inverse FFT, natural order both sides, 1/N normalised."""
    xc = as_complex_array(x)
    n = xc.real.shape[-1]
    n2b, n1b = big_split(n)
    p = ComplexArray(natural_to_big_permuted(xc.real, n2b, n1b),
                     natural_to_big_permuted(xc.imag, n2b, n1b))
    return ifft_big_from_permuted(p, interpret, precision, donate)
