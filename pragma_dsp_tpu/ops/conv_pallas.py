"""Fused circular-convolution Pallas kernel: fft -> xH -> ifft, one HBM pass.

The overlap-save FIR path (ops/fir.py, reference contract
src/core/fft.ts:89-148 forward/inverse convention + scipy lfilter
semantics) previously paid five HBM passes per block batch: materialise
frames, materialise an all-zeros imaginary plane, forward FFT kernel,
pointwise multiply, inverse FFT kernel. This kernel keeps the whole
pipeline in VMEM:

* real frames (tb, n) stream in; the zero imaginary plane never exists;
* forward: windowless plane DFT_N2 (exactly-zero imag planes of the
  real input are specialised away) -> per-row four-step twiddle ->
  shared-FF lane DFT on the MXU (rows with a zero imag plane use the
  top half of FF only);
* the filter spectrum H lives in VMEM as an (n2, 128) digit-permuted
  row table — the same permuted order the rows are produced in, so the
  pointwise complex multiply is two VPU FMAs per row, no reordering;
* inverse: shared-GG lane dot (1/N folded) -> inverse twiddle -> plane
  DFT back to natural time order. Only the real part is stored; Mosaic
  dead-code-eliminates the imaginary chain of the final plane DFT.
* the caller drops a lane-aligned multiple of 128 garbage samples per
  block (overlap-save discard), so the valid region is a free slice.

precision="bf16x3" runs both lane dots as three DEFAULT bf16 passes on
hi/lo-split operands (~105 dB SNR); "highest" uses f32 HIGHEST dots
(~140 dB). Non-TPU backends run in interpreter mode automatically.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.complex import Array, is_power_of_two
from .fft_pallas import (
    LANES,
    _bsplit,
    _const_spec,
    _df_dot,
    _fft_plan,
    _hi_dot,
    _pad_batch,
    _padd,
    _pick_tile,
    _plane_dft,
    _pmul,
    _psub,
    _tuning,
    _use_interpret,
)

__all__ = ["circular_convolve_pallas"]


def _osconv_kernel(f_ref, hr_ref, hi_ref, *refs, n, n2, fast):
    """(tb, n) real frames -> (tb, n) real circular convolution with H."""
    o_ref = refs[-1]
    if fast:
        ffh_ref, ffl_ref, twc_ref, tws_ref = refs[0:4]
        ggh_ref, ggl_ref, itwc_ref, itws_ref = refs[4:8]

        def mk_mm(h_ref, l_ref):
            def mm(cat, rows=None):
                hi, lo = _bsplit(cat)
                mh = h_ref[:] if rows is None else h_ref[:rows]
                ml = l_ref[:] if rows is None else l_ref[:rows]
                return _df_dot(hi, mh) + (_df_dot(hi, ml) + _df_dot(lo, mh))
            return mm

        mmf = mk_mm(ffh_ref, ffl_ref)
        mmi = mk_mm(ggh_ref, ggl_ref)
    else:
        ff_ref, twc_ref, tws_ref = refs[0:3]
        gg_ref, itwc_ref, itws_ref = refs[3:6]

        def mk_mm(m_ref):
            def mm(cat, rows=None):
                m = m_ref[:] if rows is None else m_ref[:rows]
                return _hi_dot(cat, m)
            return mm

        mmf = mk_mm(ff_ref)
        mmi = mk_mm(gg_ref)

    L = LANES
    xs = [f_ref[:, L * s:L * (s + 1)].astype(jnp.float32) for s in range(n2)]
    ar, ai = _plane_dft(xs, [None] * n2, -1.0)

    br, bi = [], []
    for u in range(n2):
        if u == 0:
            tr, ti = ar[0], ai[0]
        else:
            c = twc_ref[u:u + 1, :]
            s = tws_ref[u:u + 1, :]
            tr = _psub(_pmul(ar[u], c), _pmul(ai[u], s))
            ti = _padd(_pmul(ar[u], s), _pmul(ai[u], c))
        if ti is None:
            y = mmf(tr, rows=L)          # real row: top half of FF
        else:
            y = mmf(jnp.concatenate([tr, ti], axis=1))
        zre, zim = y[:, :L], y[:, L:]
        # pointwise multiply by the permuted-order filter spectrum row
        hr = hr_ref[u:u + 1, :]
        hi_ = hi_ref[u:u + 1, :]
        pre = zre * hr - zim * hi_
        pim = zre * hi_ + zim * hr
        # inverse lane dot (1/N folded into GG), then inverse twiddle
        w = mmi(jnp.concatenate([pre, pim], axis=1))
        wre, wim = w[:, :L], w[:, L:]
        if u == 0:
            br.append(wre)
            bi.append(wim)
        else:
            c = itwc_ref[u:u + 1, :]
            s = itws_ref[u:u + 1, :]
            br.append(wre * c - wim * s)
            bi.append(wre * s + wim * c)
    xr, _ = _plane_dft(br, bi, 1.0)      # imag chain of this stage DCEs
    odt = o_ref.dtype
    for s_ in range(n2):
        o_ref[:, L * s_:L * (s_ + 1)] = xr[s_].astype(odt)


@functools.partial(jax.jit,
                   static_argnames=("n", "interpret", "precision"))
def _osconv_2d(frames: Array, hre: Array, him: Array, n: int,
               interpret: bool, precision: str) -> Array:
    batch = frames.shape[0]
    tb = _pick_tile(batch, n)            # 2 lane-dot planes in flight
    (frames,), padded = _pad_batch((frames,), batch, tb)
    fwd = [jnp.asarray(c) for c in _fft_plan(n, False, precision)]
    inv = [jnp.asarray(c) for c in _fft_plan(n, True, precision)]
    consts = fwd + inv
    n2 = n // LANES
    kernel = functools.partial(_osconv_kernel, n=n, n2=n2,
                               fast=(precision == "bf16x3"))
    spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_tuning()["vmem_limit_bytes"])
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


def circular_convolve_pallas(frames, hspec_permuted, n: int,
                             interpret: Optional[bool] = None,
                             precision: str = "highest") -> Array:
    """Circular convolution of real frames [batch..., n] with a filter
    given by its digit-permuted spectrum ([n2, 128] ComplexArray from
    :func:`fft_pallas_permuted`), fused in one kernel (numpy convention:
    ifft(fft(x) * H), inverse 1/N folded in).
    """
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
    hre = jnp.asarray(hspec_permuted.real, jnp.float32).reshape(n2, LANES)
    him = jnp.asarray(hspec_permuted.imag, jnp.float32).reshape(n2, LANES)
    out = _osconv_2d(frames.reshape(-1, n), hre, him, n, interp, precision)
    return out.reshape(shape)
