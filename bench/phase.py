#!/usr/bin/env python3
"""Phase-semantics benches: sine-vs-cosine delta-phi, phase sweep, size
sweep (reference bench/reallife/phase.ts)."""

from __future__ import annotations

import numpy as np

from helpers import finish, cosine, get_context, parse_args, sine, verified


def main():
    args = parse_args()
    import jax.numpy as jnp

    from pragma_dsp_tpu.ops import fft
    from pragma_dsp_tpu.xform import phase

    bc = get_context(args)
    n, sr, k = 1024, 48000.0, 8
    f = k * sr / n
    s = jnp.asarray(sine(f, 1.0, 0.0, sr, n).astype(np.float32))
    c = jnp.asarray(cosine(f, 1.0, 0.0, sr, n).astype(np.float32))

    ps = float(phase(fft(s))[k])
    pc = float(phase(fft(c))[k])
    d = (pc - ps + np.pi) % (2 * np.pi) - np.pi
    verified("cosine leads sine by pi/2", abs(d - np.pi / 2) < 1e-4,
             f"delta {d:.6f}")

    bc.time("phase(fft(sine))", lambda: phase(fft(s)), samples_per_call=n)
    for deg in (0, 45, 90, 180, 270):
        rad = np.deg2rad(deg)
        xx = jnp.asarray(sine(f, 1.0, rad, sr, n).astype(np.float32))
        got = float(phase(fft(xx))[k])
        want = (rad - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
        ok = abs((got - want + np.pi) % (2 * np.pi) - np.pi) < 1e-3
        verified(f"phase sweep {deg}deg", ok, f"{got:.4f} vs {want:.4f}")
    for size in (64, 256, 1024, 4096):
        xx = jnp.asarray(sine(8 * sr / size, 1.0, 0.0, sr, size).astype(np.float32))
        bc.time(f"fft+phase n={size}", lambda v=xx: phase(fft(v)),
                samples_per_call=size)
    print(bc.report())


if __name__ == "__main__":
    main()
    finish()
