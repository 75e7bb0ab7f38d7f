#!/usr/bin/env python3
"""Floor probe for the fused circular-conv pair kernel (round-3 VERDICT
weak #2: its "VPU dependency chain" floor claim had no measured A/Bs).

Variants measured on the 16384x1024 real-frame workload:

  full bf16x3 / highest   the shipped pair kernel (baseline rows)
  fwd-only                forward half only (plane DFT + fwd dots + H),
                          isolates the fwd/inv pipeline composition
  bf16x1                  one bf16 pass per dot, splits still computed —
                          isolates MXU pass count
  nosplit bf16x1          one pass, operands cast with astype (no
                          Veltkamp) — isolates the split VPU cost
  planes-only             plane DFT fwd+inv and H multiply, NO lane dots
                          — isolates the VPU/IO floor of everything
                          that is not an MXU dot
"""

from __future__ import annotations

import functools
import time

import numpy as np

import helpers  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.conv_pallas import circular_convolve_pallas
    from pragma_dsp_tpu.ops.fft_pallas import (
        LANES, _bsplit, _const_spec, _df_dot, _fft_plan_fused_rows,
        _fwd_rows_fused, _inv_planes_fused, _mk_mm_rows, _pad_batch,
        _pick_tile, _plane_dft, _tuning, fft_pallas_permuted)

    interp = jax.default_backend() != "tpu"
    B, N = (16384, 1024) if not interp else (256, 1024)
    S = B * N
    K = 150 if not interp else 2
    n2 = N // LANES
    rng = np.random.default_rng(0)
    fr = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    h = np.zeros(N, np.float32)
    h[:127] = np.hamming(127) / np.hamming(127).sum()
    hspec = fft_pallas_permuted(
        ComplexArray(jnp.asarray(h), jnp.zeros(N, jnp.float32)),
        interpret=interp, precision="highest")
    hre = jnp.asarray(hspec.real, jnp.float32).reshape(n2, LANES)
    him = jnp.asarray(hspec.imag, jnp.float32).reshape(n2, LANES)

    def timed(step, argtuple, k):
        @jax.jit
        def run(*a):
            out = lax.fori_loop(0, k, lambda _, c: step(*c), a)
            return sum(jnp.sum(t.reshape(-1)[::113]) for t in
                       jax.tree_util.tree_leaves(out))
        float(run(*argtuple))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*argtuple))
            best = min(best, time.perf_counter() - t0)
        return best

    rtt = timed(lambda v: (v * 1.000001,), (jnp.ones((8, 128)),), 400)
    print(f"RTT {rtt*1e3:.1f} ms")

    def report(name, t, k):
        per = (t - rtt) / k
        print(f"{name:28s} {per*1e3:7.3f} ms  {S/per/1e6:8.0f} MS/s  "
              f"hbm {100*S*8/per/819e9:5.1f}%", flush=True)
        return per

    # ── baseline: the shipped pair kernel ──
    for prec in ("bf16x3", "highest"):
        t = timed(lambda f, _p=prec: (circular_convolve_pallas(
            f, hspec, N, interpret=interp, precision=_p, donate=True),),
            (fr,), K)
        report(f"full {prec}", t, K)

    # ── experimental kernel variants (pair layout: fa/fb half-batches) ──

    def make_variant(mode, prec):
        """mode: fwd-only | bf16x1 | nosplit | planes-only | full"""
        fast = prec == "bf16x3"

        def mk_mm(h_ref, l_ref):
            if mode == "bf16x1":
                def mm(cat, u, rows=None):
                    hi, lo = _bsplit(cat)
                    mh = h_ref[u] if rows is None else h_ref[u, :rows]
                    return _df_dot(hi, mh)
            elif mode == "nosplit":
                def mm(cat, u, rows=None):
                    mh = h_ref[u] if rows is None else h_ref[u, :rows]
                    return _df_dot(cat.astype(jnp.bfloat16), mh)
            else:
                return _mk_mm_rows(fast, h_ref, l_ref)
            return mm

        def kernel(fa_ref, fb_ref, hr_ref, hi_ref, *refs, n, n2):
            oa_ref, ob_ref = refs[-2], refs[-1]
            if fast:
                mmf = mk_mm(refs[0], refs[1])
                mmi = mk_mm(refs[2], refs[3])
            else:
                mmf = mk_mm(refs[0], None)
                mmi = mk_mm(refs[1], None)
            L = LANES
            xs_r = [fa_ref[:, L * s:L * (s + 1)].astype(jnp.float32)
                    for s in range(n2)]
            xs_i = [fb_ref[:, L * s:L * (s + 1)].astype(jnp.float32)
                    for s in range(n2)]
            if mode == "planes-only":
                ar, ai = _plane_dft(xs_r, xs_i, -1.0)
                rows = []
                for u in range(n2):
                    hr = hr_ref[u:u + 1, :]
                    hi_ = hi_ref[u:u + 1, :]
                    rows.append((ar[u] * hr - ai[u] * hi_,
                                 ar[u] * hi_ + ai[u] * hr))
                xr, xi = _plane_dft([r for r, _ in rows],
                                    [i for _, i in rows], 1.0)
                odt = oa_ref.dtype
                for s_ in range(n2):
                    oa_ref[:, L * s_:L * (s_ + 1)] = xr[s_].astype(odt)
                    ob_ref[:, L * s_:L * (s_ + 1)] = xi[s_].astype(odt)
                return
            rows = []
            for u, zre, zim in _fwd_rows_fused(xs_r, xs_i, mmf, n2):
                hr = hr_ref[u:u + 1, :]
                hi_ = hi_ref[u:u + 1, :]
                rows.append((u, zre * hr - zim * hi_, zre * hi_ + zim * hr))
            odt = oa_ref.dtype
            if mode == "fwd-only":
                for u, rr, ri in rows:
                    oa_ref[:, L * u:L * (u + 1)] = rr.astype(odt)
                    ob_ref[:, L * u:L * (u + 1)] = ri.astype(odt)
                return
            xr, xi = _inv_planes_fused(rows, mmi, n2)
            for s_ in range(n2):
                oa_ref[:, L * s_:L * (s_ + 1)] = xr[s_].astype(odt)
                ob_ref[:, L * s_:L * (s_ + 1)] = xi[s_].astype(odt)

        @functools.partial(jax.jit, static_argnames=())
        def call(fa, fb):
            batch = fa.shape[0]
            tb = _pick_tile(batch, N)
            (fa, fb), padded = _pad_batch((fa, fb), batch, tb)
            fwd = [jnp.asarray(c)
                   for c in _fft_plan_fused_rows(N, False, prec)]
            inv = [jnp.asarray(c)
                   for c in _fft_plan_fused_rows(N, True, prec)]
            consts = fwd + inv
            kfn = functools.partial(kernel, n=N, n2=n2)
            spec = pl.BlockSpec((tb, N), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
            kw = {}
            if not interp:
                kw["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=_tuning()["vmem_limit_bytes"])
            kw["input_output_aliases"] = {0: 0, 1: 1}
            out_shape = [jax.ShapeDtypeStruct((padded, N), fa.dtype)] * 2
            ya, yb = pl.pallas_call(
                kfn, grid=(padded // tb,),
                in_specs=[spec, spec, _const_spec(hre), _const_spec(him)]
                + [_const_spec(c) for c in consts],
                out_specs=[spec, spec], out_shape=out_shape,
                interpret=interp, **kw,
            )(fa, fb, hre, him, *consts)
            return ya, yb
        return call

    half = B // 2
    fa = fr[:half]
    fb = fr[half:]
    for mode, prec in (("full", "bf16x3"), ("fwd-only", "bf16x3"),
                       ("bf16x1", "bf16x3"), ("nosplit", "bf16x3"),
                       ("planes-only", "bf16x3"), ("fwd-only", "highest")):
        call = make_variant(mode, prec)
        t = timed(lambda a, b, _c=call: _c(a, b), (fa, fb), K)
        report(f"{mode} {prec}", t, K)


if __name__ == "__main__":
    main()
