#!/usr/bin/env python3
"""One-off probe: where does the n=4096 one-sided spectrum kernel spend
its time?  Runs ablated kernel variants on hardware (not part of the
bench suite; see bench/kernels.py for the real rows)."""

import functools
import sys
import time

import numpy as np

import helpers  # noqa: F401

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

# NB: both `from pragma_dsp_tpu.ops import fft_pallas` and
# `import pragma_dsp_tpu.ops.fft_pallas as fp` resolve the NAME via
# getattr on the ops package, which re-exports a FUNCTION called
# fft_pallas that shadows the submodule — go through sys.modules.
fp = importlib.import_module("pragma_dsp_tpu.ops.fft_pallas")

PREC = sys.argv[1] if len(sys.argv) > 1 else "highest"
TB = int(sys.argv[2]) if len(sys.argv) > 2 else 0
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096


def variant_kernel(x_ref, win_ref, p_ref, *refs, n, n2, fast, mode):
    o_ref = refs[-1]
    half = fp.LANES // 2
    xs = [x_ref[:, fp.LANES * s:fp.LANES * (s + 1)]
          * win_ref[:, fp.LANES * s:fp.LANES * (s + 1)] for s in range(n2)]
    if mode == "noplane":
        ar, ai = xs, [None] * n2
    else:
        ar, ai = fp._plane_dft(xs, [None] * n2, -1.0)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    if mode == "nodots":
        ys = [jnp.concatenate([a, a if b is None else b], axis=1)[:, :fp.LANES]
              for a, b in zip(ar, ai)]
    elif fast:
        mah_ref, mal_ref, mbh_ref, mbl_ref = refs[:4]

        def row(plane, m_ref, u):
            hi, lo = fp._bsplit(plane)
            mh = m_ref[u]
            ml = (mal_ref if m_ref is mah_ref else mbl_ref)[u]
            return dot(hi, mh) + (dot(hi, ml) + dot(lo, mh))
        ys = []
        for u in range(n2):
            y = row(ar[u], mah_ref, u)
            if ai[u] is not None:
                y = y + row(ai[u], mbh_ref, u)
            ys.append(y)
    else:
        mah_ref, mbh_ref = refs[:2]
        d1 = fp._dg((((1,), (0,)), ((), ())))
        ys = []
        for u in range(n2):
            y = d1(ar[u], mah_ref[u])
            if ai[u] is not None:
                y = y + d1(ai[u], mbh_ref[u])
            ys.append(y)

    if mode == "nosqrt":
        amps = [y[:, :half] + y[:, half:] for y in ys]
    else:
        amps = [jnp.sqrt(y[:, :half] * y[:, half:] + y[:, half:] * y[:, half:])
                for y in ys]
    if mode in ("noturn", "xlaturn"):
        for j in range(0, n2, 2):
            o_ref[:, half * j:half * (j + 2)] = jnp.concatenate(
                [amps[j], amps[j + 1]], axis=1)
        o_ref[:, n // 2:n // 2 + 1] = amps[0][:, :1]
        return
    p = p_ref[:]
    wdt = fp.LANES // n2

    def src(rows, u, lo, hi_):
        return rows[u][:, lo:hi_]

    nchunk = n2 * half // fp.LANES
    if mode == "batchturn":
        # ONE sublane-stacked 3-pass dot for all chunks instead of
        # 3*nchunk small dots: amortises MXU pipeline latency.
        stacked = jnp.concatenate(
            [jnp.concatenate(
                [src(amps, u, wdt * r, wdt * (r + 1)) for u in range(n2)],
                axis=1) for r in range(nchunk)], axis=0)
        h1f = fp._round_bf16_f32(stacked)
        r1 = stacked - h1f
        h2f = fp._round_bf16_f32(r1)
        h1 = h1f.astype(jnp.bfloat16)
        h2 = h2f.astype(jnp.bfloat16)
        h3 = (r1 - h2f).astype(jnp.bfloat16)
        nat = dot(h1, p) + (dot(h2, p) + dot(h3, p))
        tb = amps[0].shape[0]
        for r in range(nchunk):
            o_ref[:, fp.LANES * r:fp.LANES * (r + 1)] = \
                nat[tb * r:tb * (r + 1)]
    else:
        for r in range(nchunk):
            chunk = jnp.concatenate(
                [src(amps, u, wdt * r, wdt * (r + 1)) for u in range(n2)],
                axis=1)
            h1f = fp._round_bf16_f32(chunk)
            r1 = chunk - h1f
            h2f = fp._round_bf16_f32(r1)
            h1 = h1f.astype(jnp.bfloat16)
            h2 = h2f.astype(jnp.bfloat16)
            h3 = (r1 - h2f).astype(jnp.bfloat16)
            nat = dot(h1, p) + (dot(h2, p) + dot(h3, p))
            o_ref[:, fp.LANES * r:fp.LANES * (r + 1)] = nat
    lane = jax.lax.broadcasted_iota(jnp.int32, ar[0].shape, 1)
    alt = jnp.where(lane % 2 == 0, 1.0, -1.0).astype(ar[0].dtype)
    nys = jnp.sum(ar[0] * alt, axis=-1, keepdims=True)
    o_ref[:, n // 2:n // 2 + 1] = jnp.abs(nys) * jnp.asarray(1.0 / n, nys.dtype)


@functools.partial(jax.jit, static_argnames=("n", "mode", "precision", "tbo"))
def run_variant(x, n, mode, precision, tbo=0):
    batch = x.shape[0]
    n2, n1 = fp._split(n)
    tb = tbo or fp._pick_tile(batch, n,
                              plane_budget=fp._tuning()["spectrum_plane_budget"])
    win, pmat, mats = fp._onesided_plan(n, "hann", precision)
    bins = n // 2 + 1
    spec_in = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((tb, bins), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(variant_kernel, n=n, n2=n2,
                               fast=(precision == "bf16x3"), mode=mode)
    (x2,), padded = fp._pad_batch((x,), batch, tb)
    consts = tuple(jnp.asarray(c) for c in (win, pmat) + mats)
    out = pl.pallas_call(
        kernel,
        grid=(padded // tb,),
        in_specs=[spec_in] + [fp._const_spec(c) for c in consts],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((padded, bins), x.dtype),
        interpret=False,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fp._tuning()["vmem_limit_bytes"]),
    )(x2, *consts)
    out = out[:batch]
    if mode == "xlaturn":
        # Permuted pair-packed kernel output -> natural order via ONE
        # XLA transpose pass; optimization_barrier forces the reorder to
        # materialise (a fused consumer would elide it — free in real
        # pipelines, but here we price the standalone natural product).
        half = fp.LANES // 2
        body = out[:, :n // 2].reshape(batch, n2 // 2, 2, half)
        nat = body.transpose(0, 3, 1, 2).reshape(batch, n // 2)
        out = jax.lax.optimization_barrier(
            jnp.concatenate([nat, out[:, n // 2:]], axis=1))
    return out


def timed(step, args, k):
    @jax.jit
    def run(*a):
        out = lax.fori_loop(0, k, lambda _, c: step(*c), a)
        return sum(jnp.sum(t.reshape(-1)[::113]) for t in
                   jax.tree_util.tree_leaves(out))
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal(((1 << 24) // N, N)),
                         jnp.float32)
    K = 150

    rtt = timed(lambda v: (v * 1.000001,), (jnp.ones((8, 128)),), 400)
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    acc0 = jnp.zeros((), jnp.float32)

    def mk(op):
        def step(v, acc):
            amp = op(v)
            s = jnp.sum(amp)
            probe = v[:1, :1] + s * jnp.asarray(1e-30, v.dtype)
            return lax.dynamic_update_slice(v, probe, (0, 0)), acc + s
        return step

    S = frames.shape[0] * N
    for mode in ("full", "batchturn", "xlaturn"):
        t = timed(mk(lambda v, _m=mode: run_variant(v, N, _m, PREC, TB)),
                  (frames, acc0), K)
        per = (t - rtt) / K
        print(f"{PREC} tb={TB or 'auto'} {mode:8s}: {per*1e3:.3f} ms  "
              f"{S/per/1e6:,.0f} MS/s", flush=True)


if __name__ == "__main__":
    main()
