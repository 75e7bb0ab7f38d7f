#!/usr/bin/env python3
"""Scratch probe for kernel iteration (not part of the suite)."""

from __future__ import annotations

import time

import numpy as np

import helpers  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.conv_pallas import circular_convolve_pallas
    from pragma_dsp_tpu.ops.fft_pallas import (
        fft_pallas_permuted, spectrum_amplitude_pallas,
        spectrum_amp_phase_pallas)

    backend = jax.default_backend()
    interp = backend != "tpu"
    B, N = (16384, 1024) if backend == "tpu" else (256, 1024)
    S = B * N
    K = 40 if backend == "tpu" else 2
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)

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
        print(f"{name:44s} {per*1e3:8.3f} ms/iter  "
              f"{S/per/1e9:7.2f} GS/s", flush=True)

    h = np.zeros(N, np.float32)
    h[:127] = np.hamming(127) / np.hamming(127).sum()
    hspec = fft_pallas_permuted(
        ComplexArray(jnp.asarray(h), jnp.zeros(N, jnp.float32)),
        interpret=interp, precision="highest")

    import importlib
    _fp = importlib.import_module('pragma_dsp_tpu.ops.fft_pallas')
    _cp = importlib.import_module('pragma_dsp_tpu.ops.conv_pallas')
    orig_pick = _fp._pick_tile
    for tb in (64, 128, 256, 512):
        _fp._pick_tile = lambda batch, n, plane_budget=None, _tb=tb: _tb
        _cp._pick_tile = _fp._pick_tile
        _cp._osconv_pair_2d.clear_cache()
        t = timed(lambda f: (circular_convolve_pallas(
            f, hspec, N, interpret=interp, precision="bf16x3", donate=True),),
            (re,), K)
        report(f"pair conv bf16x3 tb={tb}", t, K)
    _fp._pick_tile = orig_pick
    _cp._pick_tile = orig_pick

    def amp_phase_step(prec):
        def step(v):
            amp, ph = spectrum_amp_phase_pallas(v, N, "hann", interp,
                                                precision=prec)
            probe = (v[:1, :1] + amp[:1, :1] * jnp.asarray(1e-30, v.dtype)
                     + ph[:1, :1] * jnp.asarray(1e-30, v.dtype))
            return (lax.dynamic_update_slice(v, probe, (0, 0)),)
        return step
    for prec in ("bf16x3", "highest"):
        t = timed(amp_phase_step(prec), (re,), K)
        report(f"amp+phase {prec}", t, K)

    def spec_step(v):
        amp = spectrum_amplitude_pallas(v, N, "hann", "one", interp,
                                        precision="bf16x3")
        probe = v[:1, :1] + amp[:1, :1] * jnp.asarray(1e-30, v.dtype)
        return (lax.dynamic_update_slice(v, probe, (0, 0)),)
    t = timed(spec_step, (re,), K)
    report("amp only bf16x3 (reference point)", t, K)

    # correctness spot checks vs numpy f64
    xs = np.asarray(re[:64], np.float64)
    ref = np.real(np.fft.ifft(np.fft.fft(xs, axis=-1)
                              * np.fft.fft(np.asarray(h, np.float64)),
                              axis=-1))
    for prec in ("bf16x3", "highest"):
        y = np.asarray(circular_convolve_pallas(
            re[:64], hspec, N, interpret=interp, precision=prec), np.float64)
        snr = 10 * np.log10((ref ** 2).sum() / ((y - ref) ** 2).sum())
        print(f"pair conv SNR [{prec}]: {snr:.1f} dB", flush=True)
    amp, ph = spectrum_amp_phase_pallas(re[:64], N, "hann", interp,
                                        precision="bf16x3")
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(N) / (N - 1))
    spec = np.fft.rfft(xs * w, axis=1)
    sc = np.full(N // 2 + 1, 2.0 / N)
    sc[0] = sc[-1] = 1.0 / N
    refamp = np.abs(spec) * sc
    snr = 10 * np.log10((refamp ** 2).sum()
                        / ((np.asarray(amp, np.float64) - refamp) ** 2).sum())
    print(f"amp SNR bf16x3: {snr:.1f} dB", flush=True)
    mask = refamp > 1e-3
    dph = np.angle(np.exp(1j * (np.asarray(ph, np.float64) - np.angle(spec))))
    print(f"max phase err (energetic bins): {np.abs(dph[mask]).max():.2e} rad",
          flush=True)


if __name__ == "__main__":
    main()
