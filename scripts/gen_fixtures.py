#!/usr/bin/env python3
"""Unit-fixture generator: NumPy-FFT golden outputs + scipy windows.

Fresh implementation of the role of reference scripts/gen_fixtures.py:
deterministic (seed 1337) random FFT cases at N in {8,16,32}, one
bin-centered sine (N=1024, k=32, A=0.8), benchmark inputs at {2048,4096},
and symmetric window values at sizes {8..4096}, all under the numpy DFT
convention (forward unnormalised, inverse 1/N).

Usage: python scripts/gen_fixtures.py [--out tests/fixtures/unit_fixtures.json.gz]
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy.signal import windows as sp_windows

from signal_defs import fft_golden, floats, generator_meta, write_json


def scipy_window(wtype: str, n: int) -> np.ndarray:
    if wtype == "rect":
        return np.ones(n, dtype=np.float64)
    fn = {"hann": sp_windows.hann, "hamming": sp_windows.hamming,
          "blackman": sp_windows.blackman}[wtype]
    return fn(n, sym=True).astype(np.float64)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/unit_fixtures.json.gz")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--sample-rate", type=float, default=48000.0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    cases = []

    for n in (8, 16, 32):
        for i in range(5):
            x = rng.standard_normal(n)
            re, im = fft_golden(x)
            cases.append({
                "name": f"rand_n{n}_{i}", "kind": "random_normal", "n": n,
                "sampleRate": args.sample_rate, "input": floats(x),
                "fftRe": floats(re), "fftIm": floats(im), "meta": {},
            })

    sine_n, sine_k, sine_amp = 1024, 32, 0.8
    idx = np.arange(sine_n, dtype=np.float64)
    x = sine_amp * np.sin(2.0 * np.pi * sine_k * idx / sine_n)
    re, im = fft_golden(x)
    cases.append({
        "name": f"sine_bincentered_n{sine_n}_k{sine_k}_a{sine_amp}",
        "kind": "sine_bin_centered", "n": sine_n,
        "sampleRate": args.sample_rate, "input": floats(x),
        "fftRe": floats(re), "fftIm": floats(im),
        "meta": {
            "binCenteredK": sine_k,
            "expectedPeakHz": sine_k * args.sample_rate / sine_n,
            "amplitude": sine_amp,
        },
    })

    for n in (2048, 4096):
        x = rng.standard_normal(n)
        re, im = fft_golden(x)
        cases.append({
            "name": f"bench_rand_n{n}", "kind": "benchmark_random_normal",
            "n": n, "sampleRate": args.sample_rate, "input": floats(x),
            "fftRe": floats(re), "fftIm": floats(im), "meta": {},
        })

    window_fixtures = []
    for wtype in ("rect", "hann", "hamming", "blackman"):
        for n in (8, 16, 32, 64, 1024, 2048, 4096):
            w = scipy_window(wtype, n)
            window_fixtures.append(
                {"type": wtype, "n": n, "sym": True, "values": floats(w)})

    payload = {
        "schemaVersion": "0.1",
        **generator_meta("scripts/gen_fixtures.py"),
        "seed": args.seed,
        "convention": {
            "forward": "X[k] = sum_{n=0..N-1} x[n] * exp(-j*2*pi*k*n/N)",
            "inverse": "x[n] = (1/N) * sum_{k=0..N-1} X[k] * exp(+j*2*pi*k*n/N)",
            "normalization": "none",
            "note": "Matches numpy.fft.fft and numpy.fft.ifft conventions.",
        },
        "windows": window_fixtures,
        "fftCases": cases,
    }
    write_json(args.out, payload)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
