"""Sharded DSP pipelines: halo-exchange overlap-save FIR, sharded
spectrogram, and the channel-sharded PFB channelizer corner turn.

Layouts follow the scaling-book recipe: pick a 1-D mesh, shard the
embarrassingly-parallel axis (batch / frames / channels) with shard_map,
and exchange only what the math requires — the K-1-sample filter halo
via `ppermute` (neighbour traffic over ICI), the channelizer's
frame->channel reshard via one `all_to_all`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.complex import Array, ComplexArray, as_complex_array
from ..ops.channelizer import pfb_channelize, pfb_taps
from ..ops.fir import fir_filter
from ..public.spectrum import SpectrumResult
from ..stream.stft import spectrogram as _spectrogram

__all__ = ["sharded_fir_filter", "sharded_spectrogram",
           "sharded_pfb_channelize"]


def sharded_fir_filter(x, taps, mesh: Mesh, axis: str = "x",
                       method: str = "auto") -> Array:
    """Causal FIR of a time-block-sharded signal, exactly equal to the
    single-device result.

    x: [..., L] with the last axis sharded over ``axis`` in D contiguous
    blocks. Each device needs the previous block's last K-1 samples —
    one `ppermute` neighbour shift (the overlap-save halo, SURVEY.md §5
    long-context analogue); device 0's halo is the filter's zero initial
    state.
    """
    taps = jnp.asarray(taps)
    k = taps.shape[0]
    d = mesh.shape[axis]

    def body(xb):
        # xb: [..., L/D] local block.
        tail = xb[..., xb.shape[-1] - (k - 1):]
        perm = [(i, (i + 1) % d) for i in range(d)]
        halo = jax.lax.ppermute(tail, axis, perm)
        is_first = jax.lax.axis_index(axis) == 0
        halo = jnp.where(is_first, jnp.zeros_like(halo), halo)
        buf = jnp.concatenate([halo, xb], axis=-1)
        return fir_filter(buf, taps, method)[..., k - 1:]

    spec = P(*([None] * (jnp.asarray(x).ndim - 1) + [axis])) \
        if not isinstance(x, ComplexArray) else None
    if isinstance(x, ComplexArray):
        nd = x.real.ndim
        pspec = P(*([None] * (nd - 1) + [axis]))
        fn = shard_map(lambda r, i: (body(r), body(i)), mesh=mesh,
                       in_specs=(pspec, pspec), out_specs=(pspec, pspec),
                       check_vma=False)
        ore, oim = fn(x.real, x.imag)
        return ComplexArray(ore, oim)
    x = jnp.asarray(x)
    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=False)
    return fn(x)


def sharded_spectrogram(x, n_fft: int, hop: Optional[int] = None,
                        window: str = "hann", sample_rate: float = 1.0,
                        sides: str = "one", *, mesh: Mesh,
                        axis: str = "x") -> SpectrumResult:
    """Spectrogram with the time axis sharded in contiguous blocks.

    Frames never straddle shards thanks to a (n_fft - hop)-sample halo
    pulled from the right neighbour with `ppermute` (the same exchange
    overlap-save uses). Per-shard frame counts stay static, so the whole
    thing jits. Local block length must be a multiple of hop.
    Result frames are sharded over ``axis``.

    Emits L/hop frames total: the first 1 + (L - n_fft)/hop match the
    single-device spectrogram exactly; the trailing (n_fft-hop)/hop
    frames treat the stream end as zero-padded (the last device has no
    right neighbour), keeping per-shard shapes equal.
    """
    hop = hop if hop is not None else n_fft // 4
    x = jnp.asarray(x)
    d = mesh.shape[axis]
    length = x.shape[-1]
    if (length // d) % hop != 0:
        raise ValueError(
            f"local block {length // d} must be a multiple of hop {hop}")
    overlap = n_fft - hop

    def body(xb):
        # Pull the first `overlap` samples of the RIGHT neighbour so the
        # frames at our block boundary are complete; the last device
        # zero-pads (those trailing frames are dropped to keep counts
        # static, matching frame_signal's drop-partial rule only at the
        # stream end).
        head = xb[..., :overlap]
        perm = [(i, (i - 1) % d) for i in range(d)]
        halo = jax.lax.ppermute(head, axis, perm)
        is_last = jax.lax.axis_index(axis) == d - 1
        halo = jnp.where(is_last, jnp.zeros_like(halo), halo)
        buf = jnp.concatenate([xb, halo], axis=-1)
        r = _spectrogram(buf, n_fft, hop, window, sample_rate, sides)
        return r.amplitude, r.phase, r.peak.index, r.peak.frequency, \
            r.peak.amplitude, r.peak.phase

    nd = x.ndim
    in_spec = P(*([None] * (nd - 1) + [axis]))
    frame_spec = P(*([None] * (nd - 1) + [axis, None]))
    peak_spec = P(*([None] * (nd - 1) + [axis]))
    fn = shard_map(body, mesh=mesh, in_specs=(in_spec,),
                   out_specs=(frame_spec, frame_spec, peak_spec, peak_spec,
                              peak_spec, peak_spec),
                   check_vma=False)
    amp, ph, pidx, pfreq, pamp, pph = fn(x)
    from ..xform.fourier import bin_frequencies
    from ..public.spectrum import SpectrumPeak

    freqs = bin_frequencies(n_fft, sample_rate, sides, dtype=amp.dtype)
    return SpectrumResult(
        frequencies=freqs, amplitude=amp, phase=ph,
        peak=SpectrumPeak(index=pidx, frequency=pfreq, amplitude=pamp,
                          phase=pph))


def sharded_pfb_channelize(x, channels: int, taps=None,
                           taps_per_branch: int = 8, *, mesh: Mesh,
                           axis: str = "x",
                           channels_sharded_out: bool = True) -> ComplexArray:
    """PFB channelizer with the time axis sharded; one all_to_all corner
    turn reshards the output so each device owns C/D whole channels
    (BASELINE config 5's layout for per-channel downstream DSP).

    Input [..., L] complex, L/D a multiple of C. Branch history crosses
    shard boundaries via a (T-1)*C-sample `ppermute` halo, so the result
    equals the single-device channelizer exactly.
    """
    xc = as_complex_array(x)
    if taps is None:
        taps = pfb_taps(channels, taps_per_branch)
    taps = np.asarray(taps, dtype=np.float64)
    t_taps = -(-taps.shape[0] // channels)
    hist = (t_taps - 1) * channels
    d = mesh.shape[axis]

    def body(xr, xi):
        # halo: previous block's last (T-1)*C samples (zero for device 0)
        perm = [(i, (i + 1) % d) for i in range(d)]
        hr = jax.lax.ppermute(xr[..., xr.shape[-1] - hist:], axis, perm)
        hi = jax.lax.ppermute(xi[..., xi.shape[-1] - hist:], axis, perm)
        first = jax.lax.axis_index(axis) == 0
        hr = jnp.where(first, jnp.zeros_like(hr), hr)
        hi = jnp.where(first, jnp.zeros_like(hi), hi)
        buf = ComplexArray(jnp.concatenate([hr, xr], axis=-1),
                           jnp.concatenate([hi, xi], axis=-1))
        y = pfb_channelize(buf, channels, taps, taps_per_branch)
        # Drop the T-1 warm-up frames recomputed from the halo.
        yr = y.real[..., t_taps - 1:, :]
        yi = y.imag[..., t_taps - 1:, :]
        if channels_sharded_out:
            # Corner turn: frames-sharded (M/D, C) -> channels-sharded
            # (M, C/D): one tiled all_to_all over the mesh axis.
            yr = jax.lax.all_to_all(yr, axis, split_axis=yr.ndim - 1,
                                    concat_axis=yr.ndim - 2, tiled=True)
            yi = jax.lax.all_to_all(yi, axis, split_axis=yi.ndim - 1,
                                    concat_axis=yi.ndim - 2, tiled=True)
        return yr, yi

    nd = xc.real.ndim
    in_spec = P(*([None] * (nd - 1) + [axis]))
    if channels_sharded_out:
        out_spec = P(*([None] * (nd - 1) + [None, axis]))
    else:
        out_spec = P(*([None] * (nd - 1) + [axis, None]))
    fn = shard_map(body, mesh=mesh, in_specs=(in_spec, in_spec),
                   out_specs=(out_spec, out_spec), check_vma=False)
    ore, oim = fn(xc.real, xc.imag)
    return ComplexArray(ore, oim)
