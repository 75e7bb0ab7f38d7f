#!/usr/bin/env python3
"""Signal benches: FFT forward / magnitude / phase / round-trip / batch
(reference bench/reallife/signals.ts)."""

from __future__ import annotations

import numpy as np

from helpers import finish, get_context, parse_args, sine, verified


def main():
    args = parse_args()
    import jax.numpy as jnp

    from pragma_dsp_tpu.core import ComplexArray, fft, ifft
    from pragma_dsp_tpu.ops import fft as fft_fast
    from pragma_dsp_tpu.xform import magnitude, phase

    bc = get_context(args)
    n, sr = 1024, 48000.0
    x = sine(8 * sr / n, 1.0, 0.0, sr, n).astype(np.float32)
    xj = jnp.asarray(x)

    out = fft_fast(xj)
    ref = np.fft.fft(x)
    err = np.abs(out.to_numpy_complex() - ref).max() / np.abs(ref).max()
    verified("fft matches numpy", err < 1e-5, f"rel err {err:.2e}")

    rt = ifft(fft(xj))
    rterr = float(np.abs(np.asarray(rt.real) - x).max())
    verified("round-trip", rterr < 1e-5, f"{rterr:.2e}")

    bc.time("fft forward n=1024", lambda: fft_fast(xj),
            samples_per_call=n)
    spec = fft_fast(xj)
    bc.time("magnitude", lambda: magnitude(spec), samples_per_call=n)
    bc.time("phase", lambda: phase(spec), samples_per_call=n)
    bc.time("round-trip", lambda: ifft(fft_fast(xj)), samples_per_call=n)

    batch = jnp.asarray(np.stack([x] * 100))
    bc.time("batch 100 frames", lambda: fft_fast(batch),
            samples_per_call=100 * n)
    print(bc.report())


if __name__ == "__main__":
    main()
    finish()
