"""Distributed four-step FFT over a device mesh (the 1M-point path).

The same Bailey decomposition the Pallas kernel uses per chip
(ops/fft_pallas.py) applied across chips: view x as (N2, N1) with the
n1 axis sharded; the column sub-DFT is device-local, the digit-swap
corner turn becomes ONE tiled `all_to_all` over the mesh axis, and the
row sub-DFT is local again. The long-context/sequence-parallel analogue
of SURVEY.md §5: the sequence (time) dimension is sharded and the only
communication is the corner turn.

Like the single-chip kernel, the forward emits digit-permuted bins
(P[k2, k1] = X[k2 + N2*k1], k2 sharded) and the inverse consumes them —
a distributed fft -> pointwise -> ifft pipeline communicates exactly
twice, and spectral postprocessing (scaling, peak-find) is layout-free.

Local sub-FFTs go through ops.dispatch, so on TPU they are themselves
the fused Pallas kernels.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.complex import ComplexArray, as_complex_array, is_power_of_two
from ..ops.dispatch import fft as _fft, ifft as _ifft
from ..ops.fft_fourstep import _twiddle_grid

__all__ = ["dist_fft", "dist_ifft", "dist_fft_shape", "permuted_to_natural_host"]


def dist_fft_shape(n: int, n_devices: int) -> Tuple[int, int]:
    """Pick (N2, N1) for a length-n distributed FFT on D devices:
    both factors divisible by D so each step shards evenly."""
    if not is_power_of_two(n):
        raise ValueError(f"FFT size must be power of two, got {n}")
    n1 = 1 << (n.bit_length() - 1) // 2
    n2 = n // n1
    while n1 % n_devices != 0 or n2 % n_devices != 0:
        n1 *= 2
        n2 //= 2
        if n2 < n_devices:
            raise ValueError(
                f"n={n} too small to shard over {n_devices} devices")
    return n2, n1


def _twiddles_fwd(n, n2, n1, sign, dtype):
    tc, ts = _twiddle_grid(n, n2, n1, sign)   # (k2, n1)
    return jnp.asarray(tc, dtype), jnp.asarray(ts, dtype)


@functools.lru_cache(maxsize=128)
def _build_dist_fft(mesh: Mesh, axis: str, n2: int, n1: int,
                    dtype_name: str, inverse: bool):
    """Build + jit the shard_map'd transform once per static signature,
    so repeated dist_fft calls hit the compilation cache instead of
    retracing (shard_map closures are not cached by identity)."""
    import jax.numpy as _jnp

    n = n2 * n1
    d = mesh.shape[axis]
    sign = 1.0 if inverse else -1.0
    dtype = _jnp.dtype(dtype_name)
    tc_full, ts_full = _twiddles_fwd(n, n2, n1, sign, dtype)

    if inverse:
        in_spec = (P(axis, None), P(axis, None))
        out_spec = (P(None, axis), P(None, axis))

        def body_fixed(pr, pi):
            # 1. local DFT+ over k1 with 1/N1 (full rows of the k2-shard).
            o = _ifft(ComplexArray(pr, pi), axis=-1)
            rr, ii = o.real, o.imag
            # 2. twiddle W^(+n1*k2) for this device's k2 rows.
            k2_off = jax.lax.axis_index(axis) * (n2 // d)
            tc = jax.lax.dynamic_slice_in_dim(tc_full, k2_off, n2 // d, 0)
            ts = jax.lax.dynamic_slice_in_dim(ts_full, k2_off, n2 // d, 0)
            tr = rr * tc - ii * ts
            ti = rr * ts + ii * tc
            # 3. corner turn: (n2/D, n1) -> (n2, n1/D).
            tr = jax.lax.all_to_all(tr, axis, split_axis=1, concat_axis=0,
                                    tiled=True)
            ti = jax.lax.all_to_all(ti, axis, split_axis=1, concat_axis=0,
                                    tiled=True)
            # 4. local DFT+ over n2 with 1/N2 — the two inverse
            # normalisations compose to exactly 1/N.
            o = _ifft(ComplexArray(tr, ti), axis=0)
            return o.real, o.imag
    else:
        in_spec = (P(None, axis), P(None, axis))
        out_spec = (P(axis, None), P(axis, None))

        def body_fixed(xr, xi):
            # 1. local DFT over n2 (full columns of the n1-shard).
            o = _fft(ComplexArray(xr, xi), axis=0)
            rr, ii = o.real, o.imag            # (k2, n1_local)
            # 2. twiddle W^(n1*k2), n1 columns of this device.
            n1_off = jax.lax.axis_index(axis) * (n1 // d)
            tc = jax.lax.dynamic_slice_in_dim(tc_full, n1_off, n1 // d, 1)
            ts = jax.lax.dynamic_slice_in_dim(ts_full, n1_off, n1 // d, 1)
            tr = rr * tc - ii * ts
            ti = rr * ts + ii * tc
            # 3. corner turn: (n2, n1/D) -> (n2/D, n1).
            tr = jax.lax.all_to_all(tr, axis, split_axis=0, concat_axis=1,
                                    tiled=True)
            ti = jax.lax.all_to_all(ti, axis, split_axis=0, concat_axis=1,
                                    tiled=True)
            # 4. local DFT over n1 rows -> P[k2, k1].
            o = _fft(ComplexArray(tr, ti), axis=-1)
            return o.real, o.imag

    return jax.jit(shard_map(body_fixed, mesh=mesh, in_specs=in_spec,
                             out_specs=out_spec, check_vma=False))


def dist_fft(x, mesh: Mesh, axis: str = "x",
             inverse: bool = False) -> ComplexArray:
    """Distributed FFT of a (N2, N1) view of a length N2*N1 signal.

    forward: input (N2, N1) natural (x[n1 + N1*n2] at [n2, n1]), n1-axis
    sharded; output (N2, N1) permuted (X[k2 + N2*k1] at [k2, k1]),
    k2-axis sharded.
    inverse: exactly the reverse (consumes permuted, emits natural),
    with 1/N scaling.

    One collective per transform: the tiled all_to_all corner turn.
    """
    xc = as_complex_array(x)
    n2, n1 = xc.real.shape[-2], xc.real.shape[-1]
    d = mesh.shape[axis]
    if n1 % d != 0 or n2 % d != 0:
        raise ValueError(f"(N2={n2}, N1={n1}) must both divide by D={d}")
    fn = _build_dist_fft(mesh, axis, n2, n1, str(xc.real.dtype), inverse)
    ore, oim = fn(xc.real, xc.imag)
    return ComplexArray(ore, oim)


def dist_ifft(p, mesh: Mesh, axis: str = "x") -> ComplexArray:
    """Inverse of :func:`dist_fft`: permuted k2-sharded in, natural
    n1-sharded out, 1/N normalised."""
    return dist_fft(p, mesh, axis, inverse=True)


def permuted_to_natural_host(p: ComplexArray) -> np.ndarray:
    """Gather a permuted (N2, N1) spectrum to the host in natural order
    (test/debug utility — production pipelines stay permuted)."""
    pr = np.asarray(p.real)
    pi = np.asarray(p.imag)
    n2, n1 = pr.shape[-2:]
    z = pr + 1j * pi
    return np.swapaxes(z, -1, -2).reshape(z.shape[:-2] + (n2 * n1,))
