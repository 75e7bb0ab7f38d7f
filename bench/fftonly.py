#!/usr/bin/env python3
"""Focused Pallas-FFT bench for kernel iteration: permuted forward and
roundtrip at both precisions, with RTT-subtracted in-jit loop timing and
roofline fractions. Complex FFT SOL = HBM_BW / 16 B/sample (8 in + 8 out)."""

from __future__ import annotations

import sys
import time

import numpy as np

import helpers  # noqa: F401  (inserts repo root into sys.path)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pragma_dsp_tpu.ops.fft_pallas import _fft_pallas_2d
    from pragma_dsp_tpu.utils.benchharness import device_specs

    backend = jax.default_backend()
    interp = backend != "tpu"
    B, N = (16384, 1024) if backend == "tpu" else (256, 1024)
    S = B * N
    K = 40 if backend == "tpu" else 2
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    im = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)

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
    print(f"dispatch RTT: {rtt*1e3:.1f} ms", flush=True)
    specs = device_specs()
    sol = specs["hbm_bytes_per_s"] / 16.0  # complex samples/s

    def report(name, total, k):
        per = max((total - rtt) / k, 1e-9)
        gs = S / per / 1e9
        print(f"{name:36s} {per*1e3:8.3f} ms/iter  {gs:7.2f} GS/s  "
              f"{100*gs*1e9/sol:5.1f}% of c64 SOL", flush=True)

    precs = sys.argv[1:] or ["bf16x3", "highest"]
    for prec in precs:
        t = timed(lambda r, i: _fft_pallas_2d(r, i, N, False, interp, prec),
                  (re, im), K)
        report(f"pallas fft permuted 1024 {prec}", t, K)

        def rt(r, i):
            pr, pi = _fft_pallas_2d(r, i, N, False, interp, prec)
            return _fft_pallas_2d(pr, pi, N, True, interp, prec)
        t = timed(rt, (re, im), max(K // 2, 1))
        report(f"pallas fft+ifft permuted {prec}", t, max(K // 2, 1))

    # correctness spot check vs numpy (natural order via transpose)
    from pragma_dsp_tpu.ops.fft_pallas import fft_pallas
    from pragma_dsp_tpu.core.complex import ComplexArray
    sub = ComplexArray(re[:64], im[:64])
    for prec in precs:
        o = fft_pallas(sub, precision=prec)
        z = np.asarray(o.real, np.float64) + 1j * np.asarray(o.imag, np.float64)
        ref = np.fft.fft(np.asarray(re[:64], np.float64)
                         + 1j * np.asarray(im[:64], np.float64), axis=-1)
        snr = 10 * np.log10((np.abs(ref) ** 2).sum()
                            / max((np.abs(z - ref) ** 2).sum(), 1e-300))
        print(f"fwd SNR vs f64 numpy [{prec}]: {snr:.1f} dB", flush=True)


if __name__ == "__main__":
    main()
