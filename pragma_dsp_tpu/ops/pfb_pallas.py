"""Fused polyphase-filterbank channelizer kernel: branch filter ->
cross-branch FFT -> natural channel order, one HBM pass.

The XLA-composed PFB (ops/channelizer.py) pays three full passes over
the stream: branch-filter write, pallas FFT read+write in permuted
order, and an XLA relayout back to natural channel order. This kernel
keeps the whole pipeline in VMEM (BASELINE.json config 5; the same
plane-structured dataflow as ops/fft_pallas.py):

* the (M, C) frame view of the IQ stream blocks over frames; each grid
  step reads its (tb, C) block plus a tiny halo array holding the
  previous H8 = roundup(T-1, 8) frames (built outside as a strided
  slice, ~T/tb extra input traffic) so branch history never crosses a
  block boundary;
* the branch filter is T shifted multiply-adds on (tb, C) planes
  against the (T, C) polyphase tap table (a runtime input — sharded
  callers pass traced taps);
* the cross-branch DFT_C rides the shared _fwd_rows pipeline
  (plane DFT over C/128 lane tiles -> per-row twiddle -> lane dots,
  bf16x3 or f32-HIGHEST);
* the digit-permuted -> natural channel corner turn rides the MXU
  inside the kernel as an exact one-hot dot (3-way bf16 split = 24
  mantissa bits, f32-exact — same trick as the fused spectrum kernel),
  so the kernel emits natural (tb, C) complex channel frames with zero
  XLA relayout passes.

Used automatically by ops.channelizer.pfb_channelize on TPU for C a
power of two >= 256 (C <= 128 is a single natural-order matmul
already); interpreter mode elsewhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.complex import Array, ComplexArray, is_power_of_two
from .fft_pallas import (
    LANES,
    _const_spec,
    _fft_plan,
    _fwd_rows,
    _mk_mm,
    _pick_tile,
    _round_bf16_f32,
    _tuning,
    _use_interpret,
    resolve_precision,
)

__all__ = ["pfb_channelize_pallas", "pfb_channelize_frames_pallas"]


@functools.lru_cache(maxsize=16)
def _chunk_perm(n2: int) -> np.ndarray:
    """One-hot lane permutation for one 128-bin natural chunk: source
    lane wdt*u + w (wdt = 128/n2 slice of permuted row u) scatters to
    bin lane n2*w + u. Exact in bf16 (one-hot)."""
    wdt = LANES // n2
    perm = np.zeros((LANES, LANES), np.float32)
    for u in range(n2):
        for w in range(wdt):
            perm[wdt * u + w, n2 * w + u] = 1.0
    return perm.astype(np.dtype(jnp.bfloat16.dtype))


def _pfb_kernel(halo_r_ref, halo_i_ref, xr_ref, xi_ref, hp_ref, p_ref,
                *refs, c, n2, t_taps, h8, fast):
    """(tb, C) complex frames + (1, H8, C) halo -> (tb, C) natural-order
    complex channel samples."""
    ore_ref, oim_ref = refs[-2], refs[-1]
    if fast:
        h_ref, l_ref, twc_ref, tws_ref = refs[:4]
        mm = _mk_mm(True, h_ref, l_ref)
    else:
        h_ref, twc_ref, tws_ref = refs[:3]
        mm = _mk_mm(False, h_ref)

    tb = xr_ref.shape[0]
    # Branch filter: out[m, p] = sum_t hp[t, p] * x[m - t, p]; frame
    # m - t for m < t lives in the halo block (previous H8 frames).
    buf_r = jnp.concatenate([halo_r_ref[0], xr_ref[:]], axis=0)
    buf_i = jnp.concatenate([halo_i_ref[0], xi_ref[:]], axis=0)
    acc_r = None
    acc_i = None
    for t in range(t_taps):
        w = hp_ref[t:t + 1, :]
        tr = buf_r[h8 - t:h8 - t + tb, :] * w
        ti = buf_i[h8 - t:h8 - t + tb, :] * w
        acc_r = tr if acc_r is None else acc_r + tr
        acc_i = ti if acc_i is None else acc_i + ti

    odt = ore_ref.dtype
    L = LANES
    if n2 == 1:
        # C = 128: the lane DFT is the whole transform, natural order.
        y = mm(jnp.concatenate([acc_r.astype(jnp.float32),
                                acc_i.astype(jnp.float32)], axis=1))
        ore_ref[:] = y[:, :L].astype(odt)
        oim_ref[:] = y[:, L:].astype(odt)
        return

    xs_r = [acc_r[:, L * s:L * (s + 1)].astype(jnp.float32)
            for s in range(n2)]
    xs_i = [acc_i[:, L * s:L * (s + 1)].astype(jnp.float32)
            for s in range(n2)]
    rows_re = []
    rows_im = []
    for u, yre, yim in _fwd_rows(xs_r, xs_i, mm, twc_ref, tws_ref, n2):
        rows_re.append(yre)
        rows_im.append(yim)

    # Natural-order corner turn on the MXU (exact 3-way split one-hot).
    p = p_ref[:]
    wdt = L // n2
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)

    def turn(rows, out_ref):
        for r in range(n2):                  # n2 chunks of 128 bins
            chunk = jnp.concatenate(
                [rows[u][:, wdt * r:wdt * (r + 1)] for u in range(n2)],
                axis=1)
            h1f = _round_bf16_f32(chunk)
            r1 = chunk - h1f
            h2f = _round_bf16_f32(r1)
            h1 = h1f.astype(jnp.bfloat16)
            h2 = h2f.astype(jnp.bfloat16)
            h3 = (r1 - h2f).astype(jnp.bfloat16)
            nat = dot(h1, p) + (dot(h2, p) + dot(h3, p))
            out_ref[:, L * r:L * (r + 1)] = nat.astype(out_ref.dtype)

    turn(rows_re, ore_ref)
    turn(rows_im, oim_ref)


@functools.partial(jax.jit,
                   static_argnames=("c", "t_taps", "interpret", "precision"))
def _pfb_2d(xr: Array, xi: Array, hp: Array, c: int, t_taps: int,
            interpret: bool, precision: str) -> Tuple[Array, Array]:
    """(M, C) complex frame planes -> (M, C) natural channel planes."""
    m = xr.shape[0]
    n2 = c // LANES
    h8 = -(-max(t_taps - 1, 1) // 8) * 8     # halo frames, sublane-aligned
    tb = _pick_tile(m, c, plane_budget=_tuning()["spectrum_plane_budget"])
    padded = -(-m // tb) * tb
    if padded != m:
        xr = jnp.pad(xr, ((0, padded - m), (0, 0)))
        xi = jnp.pad(xi, ((0, padded - m), (0, 0)))
    nb = padded // tb
    # halo[i] = frames [i*tb - h8, i*tb) (zero history before the start)
    # = the previous block's tail: a strided slice of the FREE (nb, tb,
    # c) view. The round-3 construction (top-pad the whole frame array,
    # then slice) materialised a full-size padded copy per plane just to
    # extract nb*h8 rows — measured ~0.03 ms of the shipped op's 0.2 ms
    # at config-5 scale.
    if h8 <= tb:
        blocks_r = xr.reshape(nb, tb, c)
        blocks_i = xi.reshape(nb, tb, c)
        zrow = jnp.zeros((1, h8, c), xr.dtype)
        halo_r = jnp.concatenate([zrow, blocks_r[:-1, tb - h8:]], axis=0)
        halo_i = jnp.concatenate([zrow, blocks_i[:-1, tb - h8:]], axis=0)
    else:                           # halo spans several blocks: gather
        idx = (np.arange(nb)[:, None] * tb - h8 + np.arange(h8)[None, :])
        valid = jnp.asarray(idx >= 0)[..., None]
        gidx = jnp.asarray(np.maximum(idx, 0))
        halo_r = jnp.where(valid, xr[gidx], 0)
        halo_i = jnp.where(valid, xi[gidx], 0)

    consts = [jnp.asarray(k) for k in _fft_plan(c, False, precision)]
    if n2 > 1:
        pmat = jnp.asarray(_chunk_perm(n2))
    else:
        pmat = jnp.zeros((LANES, LANES), jnp.bfloat16)  # unused at C=128

    kernel = functools.partial(_pfb_kernel, c=c, n2=n2, t_taps=t_taps,
                               h8=h8, fast=(precision == "bf16x3"))
    spec = pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, h8, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_tuning()["vmem_limit_bytes"])
    out_shape = [jax.ShapeDtypeStruct((padded, c), xr.dtype)] * 2
    ore, oim = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[halo_spec, halo_spec, spec, spec,
                  _const_spec(hp), _const_spec(pmat)]
        + [_const_spec(k) for k in consts],
        out_specs=[spec, spec],
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(halo_r, halo_i, xr, xi, hp, pmat, *consts)
    return ore[:m], oim[:m]


def _pfb_prepare(taps, channels: int, interpret, precision):
    """Shared validation + polyphase tap table for both entry shapes."""
    c = channels
    if c < LANES or not is_power_of_two(c):
        raise ValueError(
            f"fused PFB needs a power-of-two channel count >= {LANES}, "
            f"got {c}")
    precision = resolve_precision(precision)
    interp = _use_interpret() if interpret is None else interpret
    taps = jnp.asarray(taps)
    k = taps.shape[0]
    t_taps = -(-k // c)
    hp = jnp.zeros((t_taps * c,), taps.dtype).at[:k].set(taps)
    hp = hp.reshape(t_taps, c).astype(jnp.float32)
    return hp, t_taps, interp, precision


def pfb_channelize_pallas(x: ComplexArray, taps, channels: int,
                          interpret: Optional[bool] = None,
                          precision: Optional[str] = None) -> ComplexArray:
    """Fused PFB channelizer: IQ [..., L] (L a multiple of C) ->
    [..., M, C] natural-order complex channel samples, matching
    ops.channelizer.pfb_channelize exactly (same convention docstring).

    Requires C a power of two >= 128. taps may be a traced array.

    The flat-stream entry pays one XLA relayout pass (the 1-D -> 2-D
    tiling cast into the (M, C) frame view — measured ~18% of the
    config-5 row; Mosaic cannot absorb 1-D->2-D shape casts in VMEM).
    Callers whose upstream already holds (M, C)-shaped frames should
    use :func:`pfb_channelize_frames_pallas` and skip it.
    """
    c = channels
    length = x.real.shape[-1]
    if length % c != 0:
        raise ValueError(f"input length {length} not a multiple of C={c}")
    batch = x.real.shape[:-1]
    m = length // c
    frames = ComplexArray(x.real.reshape(batch + (m, c)),
                          x.imag.reshape(batch + (m, c)))
    return pfb_channelize_frames_pallas(frames, taps, c,
                                        interpret=interpret,
                                        precision=precision)


def pfb_channelize_frames_pallas(x: ComplexArray, taps, channels: int,
                                 interpret: Optional[bool] = None,
                                 precision: Optional[str] = None
                                 ) -> ComplexArray:
    """Fused PFB channelizer over an (M, C) frame view: IQ frames
    [..., M, C] (frame m holds input samples [m*C, (m+1)*C)) ->
    [..., M, C] natural-order complex channel samples.

    Identical numerics to :func:`pfb_channelize_pallas` on the
    flattened stream; fed with frames it skips the 1-D -> 2-D tiling
    relayout XLA inserts for flat input (r5 captured rows: 0.163 ms
    frames-fed vs 0.199 ms flat at config-5 scale).
    """
    c = channels
    if x.real.ndim < 2 or x.real.shape[-1] != c:
        raise ValueError(
            f"frames input must be [..., M, {c}], got {x.real.shape}")
    hp, t_taps, interp, precision = _pfb_prepare(taps, c, interpret,
                                                 precision)
    batch = x.real.shape[:-2]
    m = x.real.shape[-2]
    xr = x.real.reshape((-1, m, c))
    xi = x.imag.reshape((-1, m, c))
    if xr.shape[0] == 1:
        # the common stream case: no per-batch loop, no stack copy
        ore, oim = _pfb_2d(xr[0], xi[0], hp, c, t_taps, interp, precision)
        return ComplexArray(ore.reshape(batch + (m, c)),
                            oim.reshape(batch + (m, c)))
    outs = [ _pfb_2d(xr[b], xi[b], hp, c, t_taps, interp, precision)
             for b in range(xr.shape[0]) ]
    ore = jnp.stack([o[0] for o in outs]).reshape(batch + (m, c))
    oim = jnp.stack([o[1] for o in outs]).reshape(batch + (m, c))
    return ComplexArray(ore, oim)
