#!/usr/bin/env python3
"""Probe: 1M-point single-chip FFT paths on real hardware.

Compares the round-3 path (dist_fft on a 1-device mesh: jnp-fourstep
column FFT + separate twiddle pass + pallas row FFT) against the
round-4 two-kernel fft_big path (column kernel with folded twiddle +
row kernel, permuted end-to-end), plus the column kernel in isolation.
SNR of each measured path is checked against numpy f64 before timing.
"""

from __future__ import annotations

import time

import numpy as np

import helpers  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.fft_big import (big_permuted_to_natural,
                                            big_split, fft_big_permuted,
                                            ifft_big_from_permuted)
    from pragma_dsp_tpu.ops.fft_pallas import (_fft_pallas_cols_3d,
                                               cols_permuted_to_natural)

    interp = jax.default_backend() != "tpu"
    n = 1 << 20
    n2b, n1b = big_split(n)
    rng = np.random.default_rng(0)
    z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ref = np.fft.fft(z)
    zr = jnp.asarray(z.real, jnp.float32)
    zi = jnp.asarray(z.imag, jnp.float32)
    K = 3000 if not interp else 2

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

    def snr(got):
        return 10 * np.log10(np.sum(np.abs(ref) ** 2)
                             / np.sum(np.abs(ref - got) ** 2))

    for prec in ("bf16x3", "highest"):
        p = fft_big_permuted(ComplexArray(zr, zi), precision=prec)
        got = (np.asarray(big_permuted_to_natural(p.real, n2b, n1b))
               + 1j * np.asarray(big_permuted_to_natural(p.imag, n2b, n1b)))
        print(f"fft_big {prec}: SNR {snr(got):.1f} dB")
        rt = ifft_big_from_permuted(p, precision=prec)
        zrt = np.asarray(rt.real) + 1j * np.asarray(rt.imag)
        rtsnr = 10 * np.log10(np.sum(np.abs(z) ** 2)
                              / np.sum(np.abs(z - zrt) ** 2))
        print(f"  roundtrip SNR {rtsnr:.1f} dB")

        def big_step(r, i, _p=prec):
            o = fft_big_permuted(ComplexArray(r, i), precision=_p,
                                 donate=True)
            return o.real.reshape(-1), o.imag.reshape(-1)
        t = timed(big_step, (zr, zi), K)
        per = (t - rtt) / K
        print(f"fft_big {prec}: {per*1e3:.4f} ms  "
              f"{n/per/1e9:.1f} GS/s  "
              f"(40 B/sample => hbm {100*n*40/per/819e9:.0f}%)")

        def rt_step(r, i, _p=prec):
            p2 = fft_big_permuted(ComplexArray(r, i), precision=_p,
                                  donate=True)
            o = ifft_big_from_permuted(p2, precision=_p, donate=True)
            return o.real, o.imag
        t = timed(rt_step, (zr, zi), K // 2)
        per = (t - rtt) / (K // 2)
        print(f"fft_big+ifft roundtrip {prec}: {per*1e3:.4f} ms")

        # column kernel alone (with fold grids), donated chain
        from pragma_dsp_tpu.ops.fft_big import _interstage_grids
        gc, gs = _interstage_grids(n2b, n1b, -1.0)
        gcj, gsj = jnp.asarray(gc), jnp.asarray(gs)
        rv = zr.reshape(1, n2b, n1b)
        iv = zi.reshape(1, n2b, n1b)

        def col_step(r, i, _p=prec):
            return _fft_pallas_cols_3d(r, i, gcj, gsj, n2b, False, interp,
                                       _p, True, True)
        t = timed(col_step, (rv, iv), K)
        per = (t - rtt) / K
        print(f"  cols kernel {prec}: {per*1e3:.4f} ms "
              f"(24 B/sample => hbm {100*n*24/per/819e9:.0f}%)")

    # round-3 comparison path: dist_fft on 1-device mesh
    from pragma_dsp_tpu.parallel import data_mesh, dist_fft
    mesh1 = data_mesh(1)
    rv = zr.reshape(n2b, n1b)
    iv = zi.reshape(n2b, n1b)

    def d1_step(r, i):
        o = dist_fft(ComplexArray(r, i), mesh1)
        return o.real, o.imag
    t = timed(d1_step, (rv, iv), K)
    per = (t - rtt) / K
    print(f"dist_fft 1-dev (round-3 path): {per*1e3:.4f} ms  "
          f"{n/per/1e9:.1f} GS/s")


if __name__ == "__main__":
    main()
