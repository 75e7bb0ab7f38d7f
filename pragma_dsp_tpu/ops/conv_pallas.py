"""Fused circular-convolution Pallas kernel: fft -> xH -> ifft, one HBM pass.

The overlap-save FIR path (ops/fir.py, reference contract
src/core/fft.ts:89-148 forward/inverse convention + scipy lfilter
semantics) previously paid five HBM passes per block batch: materialise
frames, materialise an all-zeros imaginary plane, forward FFT kernel,
pointwise multiply, inverse FFT kernel. This kernel keeps the whole
pipeline in VMEM:

* real frames (tb, n) stream in; the zero imaginary plane never exists;
* forward/inverse row pipelines are the SHARED helpers from
  fft_pallas.py (_fwd_rows_fused / _inv_planes_fused / _mk_mm_rows);
  the four-step twiddles are FOLDED into per-row (256, 256) matrix
  stacks at trace time (_fft_plan_fused_rows), so the MXU performs
  them inside the same lane dot — no per-row VPU twiddle multiplies;
* the filter spectrum H lives in VMEM as an (n2, 128) digit-permuted
  row table — the same permuted order the rows are produced in, so the
  pointwise complex multiply is two VPU FMAs per row, no reordering;
* **frame pairing** (the default for batch >= 2): two real frames a, b
  convolve as ONE complex signal z = a + ib — h is real, so
  ifft(fft(z) * H) = conv(a, h) + i conv(b, h) exactly. The pair is the
  first/second HALF of the batch (free slices, natural order preserved
  on concat), so one complex FFT pipeline serves two frames: half the
  MXU work per sample vs the real kernel (which was MXU-bound at ~88%
  on v5e at bf16x3);
* the caller drops a lane-aligned multiple of 128 garbage samples per
  block (overlap-save discard), so the valid region is a free slice.

precision="bf16x3" (the TPU default via the dispatch policy) runs the
lane dots as three DEFAULT bf16 passes on hi/lo-split operands (~105 dB
SNR); "highest" uses f32 HIGHEST dots (~140 dB). donate=True aliases
the frame buffers to the outputs (input_output_aliases) — the streaming
contract that avoids XLA's hidden carry copy in loops. Non-TPU backends
run in interpreter mode automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.complex import Array, is_power_of_two
from .fft_pallas import (
    LANES,
    _const_spec,
    _fft_plan_fused_rows,
    _fwd_rows_fused,
    _inv_planes_fused,
    _mk_mm_rows,
    _pad_batch,
    _pick_tile,
    _tuning,
    _use_interpret,
    resolve_precision,
)

__all__ = ["circular_convolve_pallas"]


def _unpack_consts(refs, fast):
    """(mmf, mmi) row-indexed closures from the twiddle-folded fwd+inv
    per-row matrix stacks (_fft_plan_fused_rows)."""
    if fast:
        mmf = _mk_mm_rows(True, refs[0], refs[1])
        mmi = _mk_mm_rows(True, refs[2], refs[3])
    else:
        mmf = _mk_mm_rows(False, refs[0])
        mmi = _mk_mm_rows(False, refs[1])
    return mmf, mmi


def _osconv_kernel(f_ref, hr_ref, hi_ref, *refs, n, n2, fast):
    """(tb, n) real frames -> (tb, n) real circular convolution with H."""
    o_ref = refs[-1]
    mmf, mmi = _unpack_consts(refs[:-1], fast)
    L = LANES
    xs = [f_ref[:, L * s:L * (s + 1)].astype(jnp.float32) for s in range(n2)]
    rows = []
    for u, zre, zim in _fwd_rows_fused(xs, [None] * n2, mmf, n2):
        hr = hr_ref[u:u + 1, :]
        hi_ = hi_ref[u:u + 1, :]
        rows.append((u, zre * hr - zim * hi_, zre * hi_ + zim * hr))
    xr, _ = _inv_planes_fused(rows, mmi, n2)
    odt = o_ref.dtype
    for s_ in range(n2):
        o_ref[:, L * s_:L * (s_ + 1)] = xr[s_].astype(odt)


def _osconv_pair_kernel(f_ref, hr_ref, hi_ref, *refs, n, n2, tb, fast):
    """Two real frame sets convolved at once as z = a + ib (h real):
    ifft(fft(z) * H) = conv(a, h) + i conv(b, h). One complex pipeline,
    two frames — half the MXU work per sample of the real kernel.

    IN-BLOCK pairing: f_ref / o_ref are (2*tb, n) blocks of the FLAT
    (batch, n) frame array; rows [0, tb) pair with rows [tb, 2tb) as
    the real/imag planes (free contiguous VMEM slices). Which rows pair
    is semantically arbitrary (each frame is independent), and pairing
    inside the block keeps the operand and output FLAT in natural
    order: no (2, b/2, n) view, no half-array concat, whole-buffer
    donation. The two rejected layouts both measured a full extra HBM
    pass in real pipelines (bench/convprobe.py + the FIR composition
    A/B): separate half arrays pay a concat + sliced-donation copies
    (0.496 vs 0.299 ms standalone), and a stacked (2, b/2, n) operand
    pays reshape copies around the custom call (0.208 vs 0.131 ms on
    the 4.2M FIR127 row)."""
    o_ref = refs[-1]
    mmf, mmi = _unpack_consts(refs[:-1], fast)
    L = LANES
    xs_r = [f_ref[:tb, L * s:L * (s + 1)].astype(jnp.float32)
            for s in range(n2)]
    xs_i = [f_ref[tb:, L * s:L * (s + 1)].astype(jnp.float32)
            for s in range(n2)]
    rows = []
    for u, zre, zim in _fwd_rows_fused(xs_r, xs_i, mmf, n2):
        hr = hr_ref[u:u + 1, :]
        hi_ = hi_ref[u:u + 1, :]
        rows.append((u, zre * hr - zim * hi_, zre * hi_ + zim * hr))
    xr, xi = _inv_planes_fused(rows, mmi, n2)
    odt = o_ref.dtype
    for s_ in range(n2):
        o_ref[:tb, L * s_:L * (s_ + 1)] = xr[s_].astype(odt)
        o_ref[tb:, L * s_:L * (s_ + 1)] = xi[s_].astype(odt)


@functools.partial(jax.jit,
                   static_argnames=("n", "interpret", "precision", "donate"))
def _osconv_2d(frames: Array, hre: Array, him: Array, n: int,
               interpret: bool, precision: str,
               donate: bool = False) -> Array:
    batch = frames.shape[0]
    tb = _pick_tile(batch, n)            # 2 lane-dot planes in flight
    (frames,), padded = _pad_batch((frames,), batch, tb)
    fwd = [jnp.asarray(c) for c in _fft_plan_fused_rows(n, False, precision)]
    inv = [jnp.asarray(c) for c in _fft_plan_fused_rows(n, True, precision)]
    consts = fwd + inv
    n2 = n // LANES
    kernel = functools.partial(_osconv_kernel, n=n, n2=n2,
                               fast=(precision == "bf16x3"))
    spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_tuning()["vmem_limit_bytes"])
    if donate:
        kw["input_output_aliases"] = {0: 0}
    out = pl.pallas_call(
        kernel,
        grid=(padded // tb,),
        in_specs=[spec, _const_spec(hre), _const_spec(him)]
        + [_const_spec(c) for c in consts],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((padded, n), frames.dtype),
        interpret=interpret,
        **kw,
    )(frames, hre, him, *consts)
    return out[:batch]


@functools.partial(jax.jit,
                   static_argnames=("n", "interpret", "precision", "donate"))
def _osconv_pair_2d(f2: Array, hre: Array, him: Array, n: int,
                    interpret: bool, precision: str,
                    donate: bool = False) -> Array:
    """f2: FLAT (batch, n) frames in and out, natural order; each
    (2*tb, n) grid block pairs its two tb-row halves internally (see
    _osconv_pair_kernel)."""
    batch = f2.shape[0]
    # Tile from HALF the batch: the block spans two tb-row halves, so
    # sizing tb from the full batch would make small batches (e.g. 128
    # rows at the 128-row budget tile) pad a whole half-block of
    # garbage; large batches are budget-bound either way.
    tb = _pick_tile(-(-batch // 2), n)
    blk = 2 * tb
    padded = -(-batch // blk) * blk
    if padded != batch:
        f2 = jnp.pad(f2, ((0, padded - batch), (0, 0)))
    fwd = [jnp.asarray(c) for c in _fft_plan_fused_rows(n, False, precision)]
    inv = [jnp.asarray(c) for c in _fft_plan_fused_rows(n, True, precision)]
    consts = fwd + inv
    n2 = n // LANES
    kernel = functools.partial(_osconv_pair_kernel, n=n, n2=n2, tb=tb,
                               fast=(precision == "bf16x3"))
    spec = pl.BlockSpec((blk, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_tuning()["vmem_limit_bytes"])
    if donate:
        kw["input_output_aliases"] = {0: 0}
    out = pl.pallas_call(
        kernel,
        grid=(padded // blk,),
        in_specs=[spec, _const_spec(hre), _const_spec(him)]
        + [_const_spec(c) for c in consts],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((padded, n), f2.dtype),
        interpret=interpret,
        **kw,
    )(f2, hre, him, *consts)
    return out[:batch]


def circular_convolve_pallas(frames, hspec_permuted, n: int,
                             interpret: Optional[bool] = None,
                             precision: Optional[str] = None,
                             donate: bool = False) -> Array:
    """Circular convolution of real frames [batch..., n] with a filter
    given by its digit-permuted spectrum ([n2, 128] ComplexArray from
    :func:`fft_pallas_permuted`), fused in one kernel (numpy convention:
    ifft(fft(x) * H), inverse 1/N folded in).

    Batches >= 2 frames run the complex-pair kernel (first/second batch
    half as real/imag planes: half the MXU work per sample); a single
    frame falls back to the real kernel.
    """
    precision = resolve_precision(precision)
    frames = jnp.asarray(frames)
    if frames.shape[-1] != n:
        raise ValueError(f"frame length {frames.shape[-1]} != n {n}")
    if n <= LANES or not is_power_of_two(n):
        raise ValueError(
            f"fused convolution needs a power-of-two n > {LANES}, got {n}")
    if precision not in ("highest", "bf16x3"):
        raise ValueError(f"unknown precision {precision!r}")
    interp = _use_interpret() if interpret is None else interpret
    shape = frames.shape
    n2 = n // LANES
    # Accept ONLY the digit-permuted (n2, 128) spectrum layout (from
    # fft_pallas_permuted): a natural-order (n,) spectrum would reshape
    # cleanly and silently convolve with the wrong filter.
    if tuple(hspec_permuted.real.shape[-2:]) != (n2, LANES):
        raise ValueError(
            "hspec_permuted must be the digit-permuted (n//128, 128) "
            f"spectrum from fft_pallas_permuted; got shape "
            f"{tuple(hspec_permuted.real.shape)} for n={n}")
    hre = jnp.asarray(hspec_permuted.real, jnp.float32).reshape(n2, LANES)
    him = jnp.asarray(hspec_permuted.imag, jnp.float32).reshape(n2, LANES)
    f2 = frames.reshape(-1, n)
    b = f2.shape[0]
    if b >= 2:
        # Pair kernel: each grid block pairs its two halves internally,
        # so the frames stay one flat natural-order buffer end-to-end
        # (the batch pads up to a whole 2*tb block; garbage rows are
        # sliced off).
        out = _osconv_pair_2d(f2, hre, him, n, interp, precision, donate)
    else:
        out = _osconv_2d(f2, hre, him, n, interp, precision, donate)
    return out.reshape(shape)
