"""Four-step (Bailey) FFT formulated for the MXU — the TPU fast path.

The reference's butterfly nest (src/core/fft.ts:116-140) is a scalar VPU
workload; on TPU the FLOPs belong on the 128x128 systolic array. The
four-step decomposition N = N2 * N1 turns a length-N DFT into

    X[k2 + N2*k1] = DFT_N1( W_N^(n1*k2) * DFT_N2( x[n1 + N1*n2] ) )

i.e. two *matrix multiplications* (the sub-DFTs, with n1 kept in the
128-lane axis so the N1-DFT is a native MXU matmul) plus an element-wise
twiddle and a final digit-swap transpose. Applied recursively over the N2
axis this handles any power-of-two size; the same decomposition is what
the multi-chip distributed FFT shards (parallel/dist_fft.py), with the
transpose becoming an all_to_all.

Complex arithmetic uses split planes: one complex matmul = 4 real MXU
matmuls (3-mult Karatsuba variants trade adds for muls — not worth it on
the MXU where muls are free relative to memory movement).

All DFT matrices/twiddles are computed in float64 at trace time and cast
to the compute dtype.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.complex import Array, ComplexArray, as_complex_array, is_power_of_two

__all__ = ["fft_fourstep", "ifft_fourstep", "FOURSTEP_RADIX"]

# Lane width of the vector unit / MXU edge: sub-DFTs of this size are one
# native matmul. Must divide the transform length for the fast path.
FOURSTEP_RADIX = 128


@lru_cache(maxsize=64)
def _dft_matrix(n: int, sign: float) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of the DFT matrix W[n_, k] = exp(sign*2j*pi*n_*k/n), f64."""
    idx = np.arange(n, dtype=np.float64)
    ang = sign * 2.0 * np.pi * np.outer(idx, idx) / n
    return np.cos(ang), np.sin(ang)


@lru_cache(maxsize=64)
def _twiddle_grid(n: int, n2: int, n1: int, sign: float) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) for W_N^(n1*k2), shaped (k2=n2, n1), f64."""
    k2 = np.arange(n2, dtype=np.float64)[:, None]
    n1i = np.arange(n1, dtype=np.float64)[None, :]
    ang = sign * 2.0 * np.pi * k2 * n1i / n
    return np.cos(ang), np.sin(ang)


def _cmatmul(ar, ai, br_bi, preferred=jnp.float32):
    """(ar + i*ai) @ (br + i*bi) with split planes -> 4 real matmuls.

    Pinned to HIGHEST: at DEFAULT the TPU MXU truncates f32 operands to
    one bf16 pass (~54 dB — measured on v5e at n=128, where dispatch
    routes small transforms here). The CPU x64 test tier could never see
    that; an f32 TPU probe did."""
    br, bi = br_bi
    hi = jax.lax.Precision.HIGHEST
    rr = jnp.dot(ar, br, preferred_element_type=preferred, precision=hi)
    ri = jnp.dot(ar, bi, preferred_element_type=preferred, precision=hi)
    ir = jnp.dot(ai, br, preferred_element_type=preferred, precision=hi)
    ii = jnp.dot(ai, bi, preferred_element_type=preferred, precision=hi)
    return rr - ii, ri + ir


def _dft_last_axis(re: Array, im: Array, sign: float) -> Tuple[Array, Array]:
    """DFT over the last axis, recursive four-step; last axis is lanes."""
    n = re.shape[-1]
    dtype = re.dtype
    if n <= FOURSTEP_RADIX:
        cr, ci = _dft_matrix(n, sign)
        b = (jnp.asarray(cr, dtype), jnp.asarray(ci, dtype))
        flat_re = re.reshape(-1, n)
        flat_im = im.reshape(-1, n)
        out_re, out_im = _cmatmul(flat_re, flat_im, b, preferred=dtype)
        return out_re.reshape(re.shape), out_im.reshape(re.shape)

    n1 = FOURSTEP_RADIX
    n2 = n // n1
    batch = re.shape[:-1]
    # x[..., n1 + N1*n2] -> view (..., n2, n1): n1 stays in lanes throughout.
    re2 = re.reshape(batch + (n2, n1))
    im2 = im.reshape(batch + (n2, n1))

    # Step 1: DFT_N2 over the n2 axis (recursively), n1 in lanes as batch.
    re2 = jnp.moveaxis(re2, -2, -1)          # (..., n1, n2)
    im2 = jnp.moveaxis(im2, -2, -1)
    re2, im2 = _dft_last_axis(re2, im2, sign)
    re2 = jnp.moveaxis(re2, -1, -2)          # (..., k2, n1)
    im2 = jnp.moveaxis(im2, -1, -2)

    # Step 2: twiddle W_N^(n1*k2), element-wise over (k2, n1).
    tc, ts = _twiddle_grid(n, n2, n1, sign)
    tc = jnp.asarray(tc, dtype)
    ts = jnp.asarray(ts, dtype)
    tre = re2 * tc - im2 * ts
    tim = re2 * ts + im2 * tc

    # Step 3: DFT_N1 over the lane axis — one native MXU matmul.
    cr, ci = _dft_matrix(n1, sign)
    b = (jnp.asarray(cr, dtype), jnp.asarray(ci, dtype))
    flat_re = tre.reshape(-1, n1)
    flat_im = tim.reshape(-1, n1)
    out_re, out_im = _cmatmul(flat_re, flat_im, b, preferred=dtype)
    out_re = out_re.reshape(batch + (n2, n1))
    out_im = out_im.reshape(batch + (n2, n1))

    # Step 4: digit swap — X[k2 + N2*k1] lives at [k2, k1] -> transpose.
    out_re = jnp.moveaxis(out_re, -2, -1).reshape(batch + (n,))
    out_im = jnp.moveaxis(out_im, -2, -1).reshape(batch + (n,))
    return out_re, out_im


def fft_fourstep(x, axis: int = -1) -> ComplexArray:
    """Forward FFT (numpy convention, unnormalised) on the MXU path.

    Matches :func:`pragma_dsp_tpu.core.fft` numerically; preferred on TPU
    for batched power-of-two transforms.
    """
    xc = as_complex_array(x)
    n = xc.real.shape[axis]
    if not is_power_of_two(n):
        raise ValueError(f"FFT size must be power of two, got {n}")
    re = jnp.moveaxis(xc.real, axis, -1)
    im = jnp.moveaxis(xc.imag, axis, -1)
    out_re, out_im = _dft_last_axis(re, im, -1.0)
    return ComplexArray(jnp.moveaxis(out_re, -1, axis),
                        jnp.moveaxis(out_im, -1, axis))


def ifft_fourstep(x, axis: int = -1) -> ComplexArray:
    """Inverse FFT with 1/N normalisation on the MXU path."""
    xc = as_complex_array(x)
    n = xc.real.shape[axis]
    if not is_power_of_two(n):
        raise ValueError(f"FFT size must be power of two, got {n}")
    re = jnp.moveaxis(xc.real, axis, -1)
    im = jnp.moveaxis(xc.imag, axis, -1)
    out_re, out_im = _dft_last_axis(re, im, 1.0)
    scale = jnp.asarray(1.0 / n, dtype=out_re.dtype)
    return ComplexArray(jnp.moveaxis(out_re * scale, -1, axis),
                        jnp.moveaxis(out_im * scale, -1, axis))
