#!/usr/bin/env python3
"""Edge-case benches: zeros / DC / Nyquist / impulse / tiny / large /
padding / round-trip (reference bench/reallife/edge_cases.ts)."""

from __future__ import annotations

import numpy as np

from helpers import finish, get_context, parse_args, sine, verified


def main():
    args = parse_args()
    import jax.numpy as jnp

    from pragma_dsp_tpu import spectrum
    from pragma_dsp_tpu.core import ifft
    from pragma_dsp_tpu.ops import fft
    from pragma_dsp_tpu.xform import magnitude

    bc = get_context(args)
    n, sr = 1024, 48000.0

    zeros = jnp.zeros(n, jnp.float32)
    verified("zeros stay zero",
             float(jnp.abs(magnitude(fft(zeros))).max()) == 0.0)

    imp = jnp.zeros(n, jnp.float32).at[0].set(1.0)
    flat = np.asarray(magnitude(fft(imp)))
    verified("impulse flat spectrum", np.abs(flat - 1.0).max() < 1e-5)

    nyq = jnp.asarray((np.ones(n) * ((-1.0) ** np.arange(n))).astype(np.float32))
    r = spectrum(nyq)
    verified("nyquist energy at N/2",
             int(np.argmax(np.asarray(r.amplitude))) == n // 2)

    tiny = jnp.asarray(sine(8 * sr / n, 1e-12, 0.0, sr, n).astype(np.float32))
    mags = np.asarray(magnitude(fft(tiny)))
    verified("tiny amplitude scales linearly",
             abs(mags.max() - n * 1e-12 / 2) < 1e-12)

    big = jnp.asarray(sine(8 * sr / n, 1e6, 0.0, sr, n).astype(np.float32))
    mags = np.asarray(magnitude(fft(big)))
    verified("large amplitude relative accuracy",
             abs(mags.max() - n * 1e6 / 2) / (n * 1e6 / 2) < 1e-4)

    for name, sig in [("zeros", zeros), ("impulse", imp), ("nyquist", nyq),
                      ("tiny", tiny), ("large", big)]:
        bc.time(f"fft {name}", lambda v=sig: fft(v), samples_per_call=n)
    short = jnp.asarray(sine(1000.0, 1.0, 0.0, sr, 300).astype(np.float32))
    bc.time("spectrum zero-padded 300->1024",
            lambda: spectrum(short, sample_rate=sr, fft_size=1024),
            samples_per_call=1024)
    bc.time("round-trip", lambda: ifft(fft(big)), samples_per_call=n)
    print(bc.report())


if __name__ == "__main__":
    main()
    finish()
