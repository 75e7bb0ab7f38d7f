#!/usr/bin/env python3
"""Streaming/service benches: spectrum_fx vs spectrum overhead, cache-hit
latency, stream mapping, batched STFT throughput
(reference bench/reallife/effect.ts)."""

from __future__ import annotations

import numpy as np

from helpers import get_context, parse_args, sine, verified


def main():
    args = parse_args()
    import jax.numpy as jnp

    from pragma_dsp_tpu import spectrum
    from pragma_dsp_tpu.stream import (
        FourierService, spectrum_fx, spectrum_stream, stft, spectrogram)

    bc = get_context(args)
    n, sr = 1024, 48000.0
    x = jnp.asarray(sine(32 * sr / n, 0.8, 0.0, sr, n).astype(np.float32))
    svc = FourierService()

    a = spectrum(x, sample_rate=sr)
    b = spectrum_fx(x, service=svc, sample_rate=sr)
    verified("spectrum_fx parity",
             np.array_equal(np.asarray(a.amplitude), np.asarray(b.amplitude)))
    verified("fft cache identity", svc.fft(n) is svc.fft(n))
    verified("window cache identity",
             svc.window("hann", n) is svc.window("hann", n))

    bc.time("spectrum (plain)", lambda: spectrum(x, sample_rate=sr),
            samples_per_call=n)
    bc.time("spectrum_fx (cached svc)",
            lambda: spectrum_fx(x, service=svc, sample_rate=sr),
            samples_per_call=n)
    frames = [np.asarray(x)] * 10
    bc.time("spectrum_stream 10 frames",
            lambda: list(spectrum_stream(frames, service=svc, sample_rate=sr)),
            samples_per_call=10 * n)

    audio = jnp.asarray(
        sine(2000.0, 0.5, 0.0, sr, 10 * 48000).astype(np.float32))
    bc.time("stft 10s 4096/75%", lambda: stft(audio, 4096, 1024),
            samples_per_call=audio.shape[0])
    bc.time("spectrogram 10s 4096/75%",
            lambda: spectrogram(audio, 4096, 1024, "hann", sr),
            samples_per_call=audio.shape[0])
    print(bc.report())


if __name__ == "__main__":
    main()
