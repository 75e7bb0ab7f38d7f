#!/usr/bin/env python3
"""TPU kernel benches with RTT-amortized in-jit loop timing: Pallas FFT
(permuted / natural / roundtrip), fused spectrum, FIR, resampler,
channelizer, FM chain. The per-dispatch tunnel RTT (~27 ms here) is
measured and subtracted; each number is a chained lax.fori_loop of the
kernel, so it reflects pure device time."""

from __future__ import annotations

import time

import numpy as np

from helpers import parse_args, verified


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.fft_pallas import (_fft_pallas_2d,
                                                spectrum_amplitude_pallas)
    from pragma_dsp_tpu.ops.fft_fourstep import fft_fourstep
    from pragma_dsp_tpu.ops.fir import fir_filter
    from pragma_dsp_tpu.ops.polyphase import resample_poly
    from pragma_dsp_tpu.ops.channelizer import pfb_channelize
    from pragma_dsp_tpu.utils.benchharness import device_specs

    backend = jax.default_backend()
    interp = backend != "tpu"
    big = backend == "tpu"
    B, N = (16384, 1024) if big else (256, 1024)
    S = B * N
    K = 40 if big else 2
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
    print(f"dispatch RTT: {rtt*1e3:.1f} ms")

    def report(name, total, k, samples):
        per = max((total - rtt) / k, 1e-9)
        print(f"{name:32s} {per*1e3:8.3f} ms/iter  "
              f"{samples/per/1e6:9.0f} MS/s")

    for prec in ("highest", "bf16x3"):
        t = timed(lambda r, i: _fft_pallas_2d(r, i, N, False, interp, prec),
                  (re, im), K)
        report(f"pallas fft permuted 1024 {prec}", t, K, S)

        def rt(r, i):
            pr, pi = _fft_pallas_2d(r, i, N, False, interp, prec)
            return _fft_pallas_2d(pr, pi, N, True, interp, prec)
        t = timed(rt, (re, im), max(K // 2, 1))
        report(f"pallas fft+ifft permuted {prec}", t, max(K // 2, 1), S)

    def spec_step(prec):
        def step(v):
            amp = spectrum_amplitude_pallas(v, N, "hann", "one", interp,
                                            precision=prec)
            probe = v[:1, :1] + amp[:1, :1] * jnp.asarray(1e-30, v.dtype)
            return (lax.dynamic_update_slice(v, probe, (0, 0)),)
        return step
    t = timed(spec_step("highest"), (re,), K)
    report("pallas fused spectrum f32", t, K, S)
    t = timed(spec_step("bf16x3"), (re,), K)
    report("pallas fused spectrum bf16x3", t, K, S)

    from pragma_dsp_tpu.ops.fft_pallas import spectrum_amp_phase_pallas

    def amp_phase_step(v):
        amp, ph = spectrum_amp_phase_pallas(v, N, "hann", interp)
        probe = (v[:1, :1] + amp[:1, :1] * jnp.asarray(1e-30, v.dtype)
                 + ph[:1, :1] * jnp.asarray(1e-30, v.dtype))
        return (lax.dynamic_update_slice(v, probe, (0, 0)),)
    t = timed(amp_phase_step, (re,), K)
    report("pallas fused amp+phase f32", t, K, S)

    def fs(r, i):
        o = fft_fourstep(ComplexArray(r, i))
        return o.real, o.imag
    t = timed(fs, (re, im), K)
    report("jnp fourstep fft 1024", t, K, S)

    # Shape-changing ops (resampler, channelizer, FIR) chain through a
    # one-element probe folded back with dynamic_update_slice, so the
    # loop body cannot be hoisted. (A strided sum over every output leaf
    # here previously cost more than the op under test: the PFB measured
    # 7.6 ms with it vs 0.4 ms real.)
    def chained(op):
        def step(v, acc):
            out = op(v)
            s = sum(t.reshape(-1)[0] for t in jax.tree_util.tree_leaves(out))
            probe = v[:1] + s * jnp.asarray(1e-30, v.dtype)
            return lax.dynamic_update_slice(v, probe, (0,)), acc + s
        return step

    taps = jnp.asarray(np.hamming(127) / np.hamming(127).sum(),
                       dtype=jnp.float32)
    sig = re.reshape(-1)[: 1 << 22] if big else re.reshape(-1)
    acc0 = jnp.zeros((), jnp.float32)
    k4 = max(K // 4, 1)
    t = timed(chained(lambda v: fir_filter(v, taps, "overlap_save")),
              (sig, acc0), k4)
    report(f"overlap-save FIR127 {sig.shape[0]/1e6:.1f}M", t, k4,
           sig.shape[0])

    k8 = max(K // 8, 1)
    t = timed(chained(lambda v: resample_poly(v, 147, 160, num_taps=1177)),
              (sig, acc0), k8)
    report("resample 48k->44.1k", t, k8, sig.shape[0])

    c = 256
    iq_len = (sig.shape[0] // c) * c
    iq_sig = sig[:iq_len]
    t = timed(chained(lambda v: pfb_channelize(ComplexArray(v, v * 0.5), c)),
              (iq_sig, acc0), k8)
    report(f"PFB 256ch {iq_len/1e6:.1f}M IQ", t, k8, iq_len)

    specs = device_specs()
    print(f"device: {specs['kind']}  hbm {specs['hbm_bytes_per_s']/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
