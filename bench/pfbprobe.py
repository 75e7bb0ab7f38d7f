#!/usr/bin/env python3
"""Scratch probe: PFB channelizer component breakdown (not in the suite)."""

from __future__ import annotations

import time

import numpy as np

import helpers  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.channelizer import _branch_filter, pfb_taps
    from pragma_dsp_tpu.ops.dispatch import fft as _fft

    backend = jax.default_backend()
    S = 1 << 22 if backend == "tpu" else 1 << 16
    C = 256
    M = S // C
    K = 60 if backend == "tpu" else 2
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(S), jnp.float32)
    xi = jnp.asarray(rng.standard_normal(S), jnp.float32)
    h = pfb_taps(C, 8)

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
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    def report(name, total, k):
        per = max((total - rtt) / k, 1e-9)
        print(f"{name:40s} {per*1e3:8.3f} ms/iter  {S/per/1e9:7.2f} GS/s",
              flush=True)

    def chained(op):
        def step(v, w, acc):
            out = op(ComplexArray(v, w))
            s = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(out))
            probe = v[:1] + s * jnp.asarray(1e-30, v.dtype)
            return lax.dynamic_update_slice(v, probe, (0,)), w, acc + s
        return step

    acc0 = jnp.zeros((), jnp.float32)

    # 1. branch filter alone
    t = timed(chained(lambda z: _branch_filter(z, h, C)), (xr, xi, acc0), K)
    report("branch filter only", t, K)

    # 2. FFT-256 across branches alone (pallas natural via dispatch)
    vr = jnp.asarray(rng.standard_normal((M, C)), jnp.float32)
    vi = jnp.asarray(rng.standard_normal((M, C)), jnp.float32)
    def fft_step(a, b, acc):
        o = _fft(ComplexArray(a, b), axis=-1)
        s = o.real.reshape(-1)[0]
        probe = a[:1] + s * jnp.asarray(1e-30, a.dtype)
        return lax.dynamic_update_slice(a, probe, (0, 0)), b, acc + s
    t = timed(fft_step, (vr, vi, acc0), K)
    report("fft-256 across branches (pallas)", t, K)

    def fft_step4(a, b, acc):
        o = _fft(ComplexArray(a, b), axis=-1, impl="fourstep")
        s = o.real.reshape(-1)[0]
        probe = a[:1] + s * jnp.asarray(1e-30, a.dtype)
        return lax.dynamic_update_slice(a, probe, (0, 0)), b, acc + s
    t = timed(fft_step4, (vr, vi, acc0), K)
    report("fft-256 across branches (fourstep)", t, K)

    # 3. full channelizer (now routed to the fused kernel on TPU)
    from pragma_dsp_tpu.ops.channelizer import pfb_channelize
    t = timed(chained(lambda z: pfb_channelize(z, C)), (xr, xi, acc0), K)
    report("pfb_channelize full (fused)", t, K)

    # 4. fused kernel directly at both precisions
    from pragma_dsp_tpu.ops.pfb_pallas import pfb_channelize_pallas
    hj = jnp.asarray(h, jnp.float32)
    for prec in ("bf16x3", "highest"):
        t = timed(chained(lambda z, _p=prec: pfb_channelize_pallas(
            z, hj, C, precision=_p)), (xr, xi, acc0), K)
        report(f"pfb fused {prec}", t, K)

    # correctness on device
    sub = ComplexArray(xr[:C * 64], xi[:C * 64])
    ref = pfb_channelize_pallas(sub, hj, C, precision="highest")
    zr = np.asarray(ref.real, np.float64) + 1j*np.asarray(ref.imag, np.float64)
    import numpy as _np
    xs = _np.asarray(sub.real, _np.float64) + 1j*_np.asarray(sub.imag, _np.float64)
    xv = xs.reshape(-1, C)
    hp = _np.asarray(h, _np.float64).reshape(-1, C)
    T = hp.shape[0]
    xp = _np.concatenate([_np.zeros((T-1, C)), xv], axis=0)
    v = _np.zeros((xv.shape[0], C), complex)
    for t_ in range(T):
        v += xp[T-1-t_: T-1-t_+xv.shape[0]] * hp[t_]
    gold = _np.fft.fft(v, axis=-1)
    snr = 10*_np.log10((_np.abs(gold)**2).sum()/(_np.abs(zr-gold)**2).sum())
    print(f"fused PFB highest SNR vs f64: {snr:.1f} dB", flush=True)
    got3 = pfb_channelize_pallas(sub, hj, C, precision="bf16x3")
    z3 = np.asarray(got3.real, np.float64) + 1j*np.asarray(got3.imag, np.float64)
    snr3 = 10*_np.log10((_np.abs(gold)**2).sum()/(_np.abs(z3-gold)**2).sum())
    print(f"fused PFB bf16x3 SNR vs f64: {snr3:.1f} dB", flush=True)


if __name__ == "__main__":
    main()
