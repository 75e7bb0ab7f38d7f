#!/usr/bin/env python3
"""Amplitude-scaling benches: spectrum one/two-sided, DC/Nyquist rules,
bin-frequency sweeps, peak detection, window types, batch
(reference bench/reallife/scaling.ts)."""

from __future__ import annotations

import numpy as np

from helpers import finish, get_context, parse_args, sine, verified


def main():
    args = parse_args()
    import jax.numpy as jnp

    from pragma_dsp_tpu import spectrum
    from pragma_dsp_tpu.xform import bin_frequencies

    bc = get_context(args)
    n, sr = 1024, 48000.0
    x = jnp.asarray(sine(32 * sr / n, 0.8, 0.0, sr, n).astype(np.float32))

    r = spectrum(x, sample_rate=sr)
    verified("one-sided peak amp ~= A",
             abs(float(r.peak.amplitude) - 0.8) < 1e-3,
             f"{float(r.peak.amplitude):.5f}")
    r2 = spectrum(x, sample_rate=sr, sides="two")
    verified("two-sided peak amp ~= A/2",
             abs(float(jnp.max(r2.amplitude[1:])) - 0.4) < 1e-3)

    dc = spectrum(jnp.ones(n) * 0.5)
    verified("DC not doubled",
             abs(float(dc.amplitude[0]) - 0.5) < 1e-5)

    bc.time("spectrum one-sided", lambda: spectrum(x, sample_rate=sr),
            samples_per_call=n)
    bc.time("spectrum two-sided",
            lambda: spectrum(x, sample_rate=sr, sides="two"),
            samples_per_call=n)
    for size in (256, 1024, 4096):
        bc.time(f"bin_frequencies n={size}",
                lambda s=size: bin_frequencies(s, sr, "one"))
    for w in ("rect", "hann", "hamming", "blackman"):
        bc.time(f"spectrum window={w}",
                lambda w=w: spectrum(x, sample_rate=sr, window=w),
                samples_per_call=n)
    batch = jnp.asarray(np.stack([np.asarray(x)] * 100))
    bc.time("spectrum batch 100", lambda: spectrum(batch, sample_rate=sr),
            samples_per_call=100 * n)
    print(bc.report())


if __name__ == "__main__":
    main()
    finish()
