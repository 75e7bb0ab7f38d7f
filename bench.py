#!/usr/bin/env python3
"""Headline benchmark: 1024-pt FFT + Hann spectrum throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}

vs_baseline is the measured HBM-bytes/time fraction of the per-chip
peak bandwidth (the reference publishes no numbers — PLAN.md:12 "not
meant to be fast" — so BASELINE.json's >=80%-of-roofline north star is
the denominator). Bytes are what the kernel actually moves: batch*n*4
f32 samples in + batch*(n//2+1)*4 one-sided amplitudes out (~6.005
B/sample), NOT the round-2 8 B/sample assumption (round-2 VERDICT
weak #1-2: report measured bytes over peak, nothing flattering).

Timing discipline: the remote-TPU dispatch round trip is ~27 ms, so the
measured step is a lax.fori_loop chain of K pipeline iterations inside
one jit; RTT is measured separately with an empty loop and subtracted.
Checksums of the outputs are printed to stderr as regression guardrails
(reference bench/run.ts:32-35 philosophy).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pragma_dsp_tpu.ops.fft_pallas import spectrum_amplitude_pallas
    from pragma_dsp_tpu.utils.benchharness import checksum, device_specs

    backend = jax.default_backend()
    specs = device_specs()
    log(f"backend={backend} device={specs['kind']}")

    n = 1024
    batch = 16384 if backend == "tpu" else 256
    # fori_loop compiles once regardless of trip count; the loop must
    # dwarf the ~24 ms tunnel RTT to keep run-to-run noise under ~3%.
    k = 250 if backend == "tpu" else 3
    samples = batch * n

    rng = np.random.default_rng(1337)
    t = np.arange(n) / 48000.0
    base = 0.8 * np.sin(2 * np.pi * 1500.0 * t)
    x = np.tile(base, (batch, 1)) + 0.01 * rng.standard_normal((batch, n))
    x = jnp.asarray(x, dtype=jnp.float32)
    interp = backend != "tpu"

    def pipeline(xv):
        # fused window->FFT->|X|->scaling kernel producing the complete
        # one-sided amplitude product; a one-element dynamic-update-slice
        # keeps the loop body live (carry depends on the output) without
        # the full-array elementwise pass a broadcast add would cost.
        # bf16x3 split dots (SNR >= 110 dB, asserted below on real output)
        # are the production fast path; the full-f32 mode is timed too.
        amp = spectrum_amplitude_pallas(xv, n, "hann", "one", interp,
                                        precision="bf16x3")
        probe = xv[:1, :1] + amp[:1, :1] * jnp.asarray(1e-30, xv.dtype)
        return lax.dynamic_update_slice(xv, probe, (0, 0))

    def pipeline_full(xv):
        amp = spectrum_amplitude_pallas(xv, n, "hann", "one", interp,
                                        precision="highest")
        probe = xv[:1, :1] + amp[:1, :1] * jnp.asarray(1e-30, xv.dtype)
        return lax.dynamic_update_slice(xv, probe, (0, 0))

    def timed(step, arg, iters, repeats=5):
        """Sorted per-run wall times of `repeats` chained-loop runs.

        Round-3 VERDICT weak #1: one min-of-3 number cannot distinguish
        shared-device variance from a real regression — every gated mode
        now reports min/median/spread, and the JSON carries them."""
        @jax.jit
        def run(v):
            out = lax.fori_loop(0, iters, lambda _, c: step(c), v)
            return jnp.sum(out[::37])
        float(run(arg))  # compile + warm
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(arg))
            times.append(time.perf_counter() - t0)
        return sorted(times)

    def stats(times, iters):
        per = [max((t - rtt) / iters, 1e-9) for t in times]
        mn, md = per[0], per[len(per) // 2]
        spread = (per[-1] - per[0]) / md
        return dict(min_ms=round(mn * 1e3, 4), median_ms=round(md * 1e3, 4),
                    spread_pct=round(100 * spread, 1),
                    runs_ms=[round(v * 1e3, 4) for v in per])

    # RTT floor via an empty-ish loop on a tiny array.
    tiny = jnp.ones((8, 128))
    rtt = timed(lambda v: v * 1.000001, tiny, 400)[0]
    log(f"dispatch RTT ~ {rtt*1e3:.1f} ms")

    # 10 repeats for the headline (round-4 VERDICT #7: the spread gate
    # needs a distribution, and the recorded runs double as the variance
    # study in BASELINE.md).
    t_head = timed(pipeline, x, k, repeats=10)
    head_stats = stats(t_head, k)
    per_iter = head_stats["min_ms"] / 1e3
    msps = samples / per_iter / 1e6
    log(f"headline timing: min {head_stats['min_ms']:.3f} ms  median "
        f"{head_stats['median_ms']:.3f} ms  spread "
        f"{head_stats['spread_pct']:.1f}%")

    t_full = timed(pipeline_full, x, k)
    full_stats = stats(t_full, k)
    per_full = full_stats["min_ms"] / 1e3
    log(f"full-f32 mode: {samples / per_full / 1e6:.0f} Msamples/s "
        f"({per_full*1e3:.3f} ms/iter, median {full_stats['median_ms']:.3f})")

    # guardrails: checksum, peak bin, and SNR of the fast path vs f64
    # numpy. These GATE: any failure emits "ok": false and exits 1
    # (round-1 VERDICT weak #5).
    failures = []
    amp = spectrum_amplitude_pallas(x, n, "hann", "one", interp,
                                    precision="bf16x3")
    log(f"spectrum checksum: {checksum(amp):.6f}")
    peak_bin = int(np.argmax(np.asarray(amp[0])[1:])) + 1
    log(f"peak bin: {peak_bin} (expect 32)")
    if peak_bin != 32:
        failures.append(f"peak bin {peak_bin} != 32")
    sub = np.asarray(amp[:64], dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    ref = np.abs(np.fft.rfft(np.asarray(x[:64], np.float64) * w, axis=1))
    sc = np.full(n // 2 + 1, 2.0 / n)
    sc[0] = sc[-1] = 1.0 / n
    ref *= sc
    snr = 10 * np.log10((ref ** 2).sum() / max(((sub - ref) ** 2).sum(), 1e-300))
    log(f"fast-path SNR vs f64 reference: {snr:.1f} dB")
    if snr < 105.0:
        failures.append(f"SNR {snr:.1f} dB < 105 dB")

    # FFT roundtrip guardrail on the production (bf16x3, donated) path:
    # ifft(fft(x)) must stay >= 105 dB vs the input (VERDICT r2 #1 gate).
    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.fft_pallas import (
        fft_pallas_permuted, ifft_pallas_from_permuted)
    sub_re = x[:64]
    sub_im = jnp.asarray(
        rng.standard_normal(sub_re.shape), dtype=jnp.float32)
    p = fft_pallas_permuted(ComplexArray(sub_re, sub_im), interpret=interp,
                            precision="bf16x3")
    back = ifft_pallas_from_permuted(p, n, interpret=interp,
                                     precision="bf16x3")
    num = (np.asarray(sub_re, np.float64) ** 2
           + np.asarray(sub_im, np.float64) ** 2).sum()
    den = ((np.asarray(back.real, np.float64) - np.asarray(sub_re, np.float64)) ** 2
           + (np.asarray(back.imag, np.float64) - np.asarray(sub_im, np.float64)) ** 2).sum()
    rt_snr = 10 * np.log10(num / max(den, 1e-300))
    log(f"fft+ifft roundtrip SNR (bf16x3): {rt_snr:.1f} dB")
    if rt_snr < 105.0:
        failures.append(f"roundtrip SNR {rt_snr:.1f} dB < 105 dB")

    # Small-transform guardrail: dispatch routes n <= 128 to the
    # fourstep matmul path, whose DEFAULT-precision dots silently ran at
    # ~54 dB on TPU until round 3 (the x64 CPU test tier cannot see MXU
    # truncation). Gate it on real hardware.
    from pragma_dsp_tpu.ops.dispatch import fft as _dfft
    small = ComplexArray(x[:64, :128], sub_im[:, :128])
    o = _dfft(small, axis=-1)
    zs = np.asarray(o.real, np.float64) + 1j * np.asarray(o.imag, np.float64)
    zr = np.fft.fft(np.asarray(small.real, np.float64)
                    + 1j * np.asarray(small.imag, np.float64), axis=-1)
    s_snr = 10 * np.log10((np.abs(zr) ** 2).sum()
                          / max((np.abs(zs - zr) ** 2).sum(), 1e-300))
    log(f"small-n (128) dispatch FFT SNR: {s_snr:.1f} dB")
    if s_snr < 120.0:
        failures.append(f"small-n FFT SNR {s_snr:.1f} dB < 120 dB")

    # ── configs 2-5 + 1M hardware SNR gates (round-3 VERDICT #3: the
    # spectrogram/resampler/WBFM/PFB SNRs previously came from probe
    # runs only — a precision regression in any of them would have
    # shipped with ok=true). Each gate compares the production TPU f32
    # path against an INDEPENDENT f64 oracle (numpy/scipy computed here,
    # or the committed scipy fixtures), reference goldens-as-guardrails
    # philosophy (reference PLAN.md:144-184). ──

    def snr_of(ref, got):
        ref = np.asarray(ref, np.float64)
        got = np.asarray(got, np.float64)
        return 10 * np.log10((ref ** 2).sum()
                             / max(((got - ref) ** 2).sum(), 1e-300))

    def gate(name, val, bound):
        ok = val >= bound
        log(f"GATE {name}: {val:.1f} dB (>= {bound:.0f}) "
            f"{'PASS' if ok else 'FAIL'}")
        if not ok:
            failures.append(f"{name} {val:.1f} dB < {bound:.0f} dB")

    # config 2: 4096-pt 75%-overlap spectrogram of 10 s 48 kHz audio.
    from pragma_dsp_tpu.stream import spectrogram_amplitude
    fs = 48000.0
    lsig = 480000 if backend == "tpu" else 48000
    tt = np.arange(lsig) / fs
    sig = (0.7 * np.sin(2 * np.pi * 997.0 * tt)
           + 0.2 * np.sin(2 * np.pi * (4000.0 + 300.0 * tt) * tt)
           + 0.01 * rng.standard_normal(lsig))
    nspec, hop = 4096, 1024
    amp_tpu = np.asarray(spectrogram_amplitude(
        jnp.asarray(sig, jnp.float32), nspec, hop, "hann"))
    frames = 1 + (lsig - nspec) // hop
    wspec = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(nspec) / (nspec - 1))
    idx = np.arange(frames)[:, None] * hop + np.arange(nspec)[None, :]
    ref_amp = np.abs(np.fft.rfft(sig[idx] * wspec, axis=-1))
    scs = np.full(nspec // 2 + 1, 2.0 / nspec)
    scs[0] = scs[-1] = 1.0 / nspec
    ref_amp *= scs
    c2_snr = snr_of(ref_amp, amp_tpu)
    gate("config2 spectrogram 4096/75%", c2_snr, 105.0)

    # config 3: 48k->44.1k 127-tap polyphase resample vs the committed
    # scipy fixture (tests/fixtures/dsp/resampler.json.gz).
    from pragma_dsp_tpu.ops import upfirdn
    from pragma_dsp_tpu.utils.fixtures import fixtures_dir, load_json
    rs = load_json(os.path.join(fixtures_dir(), "dsp", "resampler.json"))
    rs_snr = min(
        snr_of(c["output"],
               upfirdn(jnp.asarray(c["input"], jnp.float32),
                       np.asarray(c["taps"]), c["up"], c["down"]))
        for c in rs["cases"])
    gate("config3 resampler 48k->44.1k", rs_snr, 100.0)

    # config 4: WBFM chain vs an independent f64 scipy/numpy chain.
    from scipy.signal import lfilter, upfirdn as sp_upfirdn
    from pragma_dsp_tpu.models.fm_receiver import FmReceiver, wbfm_demod
    liq = 1050000 if backend == "tpu" else 105000
    tiq = np.arange(liq) / 2.4e6
    msg = (0.7 * np.sin(2 * np.pi * 1000.0 * tiq)
           + 0.2 * np.sin(2 * np.pi * 4000.0 * tiq))
    ziq = np.exp(1j * (0.5 + 2 * np.pi * 75e3 * np.cumsum(msg) / 2.4e6))
    rx = FmReceiver()
    from pragma_dsp_tpu.core.complex import ComplexArray as _CA
    audio_tpu = np.asarray(wbfm_demod(_CA(
        jnp.asarray(ziq.real, jnp.float32),
        jnp.asarray(ziq.imag, jnp.float32))))
    chan = sp_upfirdn(rx._chan_taps, ziq, 1, 10)
    prev = np.concatenate([[1.0 + 0.0j], chan[:-1]])
    dphi = np.angle(chan * np.conj(prev))
    xif = dphi * (240e3 / (2 * np.pi)) / 75e3
    alpha = float(np.exp(-1.0 / (240e3 * 75e-6)))
    yif = lfilter([1.0 - alpha], [1.0, -alpha], xif)
    audio_ref = sp_upfirdn(rx._audio_taps, yif, 1, 5)
    m = min(audio_ref.shape[0], audio_tpu.shape[-1])
    c4_snr = snr_of(audio_ref[:m], audio_tpu[:m])
    gate("config4 WBFM chain", c4_snr, 100.0)

    # config 5: 256-channel PFB vs the generator-convention f64 oracle
    # (scripts/gen_dsp_refs.py pfb_cases), f32 input path.
    from pragma_dsp_tpu.ops import pfb_channelize, pfb_taps
    cch, tpb, mfr = 256, 8, 512
    niq = cch * mfr
    zp = rng.standard_normal(niq) + 1j * rng.standard_normal(niq)
    htaps = np.asarray(pfb_taps(cch, tpb), np.float64)
    y_tpu = pfb_channelize(_CA(jnp.asarray(zp.real, jnp.float32),
                               jnp.asarray(zp.imag, jnp.float32)), cch)
    hp = np.zeros((tpb, cch))
    hp.ravel()[:htaps.shape[0]] = htaps
    xb = np.concatenate([np.zeros((tpb - 1) * cch, complex), zp])
    xb = xb.reshape(tpb - 1 + mfr, cch)
    v = np.zeros((mfr, cch), complex)
    for t_ in range(tpb):
        v += hp[t_] * xb[tpb - 1 - t_: tpb - 1 - t_ + mfr]
    y_ref = np.fft.fft(v, axis=-1)
    pfb_snr = 10 * np.log10(
        (np.abs(y_ref) ** 2).sum()
        / max(((np.asarray(y_tpu.real, np.float64) - y_ref.real) ** 2
               + (np.asarray(y_tpu.imag, np.float64) - y_ref.imag) ** 2
               ).sum(), 1e-300))
    gate("config5 PFB 256ch", pfb_snr, 105.0)

    # 1M-point two-kernel FFT (north-star long transform, BASELINE.json).
    from pragma_dsp_tpu.ops import fft_big_permuted
    from pragma_dsp_tpu.ops.fft_big import big_permuted_to_natural
    n1m = 1 << 20 if backend == "tpu" else 1 << 16
    z1m = rng.standard_normal(n1m) + 1j * rng.standard_normal(n1m)
    p1m = fft_big_permuted(_CA(jnp.asarray(z1m.real, jnp.float32),
                               jnp.asarray(z1m.imag, jnp.float32)))
    n2b, n1b = p1m.real.shape[-2:]
    got1m = (np.asarray(big_permuted_to_natural(p1m.real, n2b, n1b),
                        np.float64)
             + 1j * np.asarray(big_permuted_to_natural(p1m.imag, n2b, n1b),
                               np.float64))
    ref1m = np.fft.fft(z1m)
    fft1m_snr = 10 * np.log10(
        (np.abs(ref1m) ** 2).sum()
        / max((np.abs(got1m - ref1m) ** 2).sum(), 1e-300))
    gate(f"{n1m >> 10}k-pt fused FFT", fft1m_snr, 105.0)

    # Throughput gate (round-3 VERDICT #2: a 2x perf regression must not
    # ship green). 75 GS/s is ~0.85x the slowest of the r2/r3 headline
    # captures on this shared device; only meaningful on real hardware.
    if backend == "tpu" and msps < 75000.0:
        failures.append(f"headline {msps:.0f} MS/s < 75000 MS/s floor")
    # Spread + median gates (round-4 VERDICT #7: min-of-N stays lucky
    # while a slow creep widens the distribution — bound both). The 30%
    # spread bound is ~2x the 10-run spread measured on this shared
    # device (variance study in BASELINE.md); the median floor holds the
    # TYPICAL run, not just the luckiest, above ~0.8x of the r4 median.
    if backend == "tpu":
        msps_med = samples / (head_stats["median_ms"] / 1e3) / 1e6
        if head_stats["spread_pct"] > 30.0:
            failures.append(
                f"headline spread {head_stats['spread_pct']:.1f}% > 30%")
        if msps_med < 70000.0:
            failures.append(
                f"headline median {msps_med:.0f} MS/s < 70000 MS/s floor")

    bytes_per_iter = batch * n * 4 + batch * (n // 2 + 1) * 4
    measured_bw = bytes_per_iter / per_iter
    log(f"measured HBM rate: {measured_bw/1e9:.0f} GB/s of "
        f"{specs['hbm_bytes_per_s']/1e9:.0f} GB/s peak")
    result = {
        "metric": "fused 1024-pt Hann spectrum throughput (1 chip)",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(measured_bw / specs["hbm_bytes_per_s"], 4),
        "ok": not failures,
        "timing": {"headline": head_stats, "full_f32": full_stats},
        "gates": {
            "headline_snr_db": round(snr, 1),
            "roundtrip_snr_db": round(rt_snr, 1),
            "small_n_snr_db": round(s_snr, 1),
            "config2_spectrogram_snr_db": round(c2_snr, 1),
            "config3_resampler_snr_db": round(rs_snr, 1),
            "config4_wbfm_snr_db": round(c4_snr, 1),
            "config5_pfb_snr_db": round(pfb_snr, 1),
            "fft_1m_snr_db": round(fft1m_snr, 1),
        },
    }
    log(f"per-iter {per_iter*1e3:.3f} ms over batch {batch}x{n}")
    print(json.dumps(result))
    if failures:
        log("FAILED guardrails: " + "; ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
