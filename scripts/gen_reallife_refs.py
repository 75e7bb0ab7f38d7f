#!/usr/bin/env python3
"""Real-life reference generator: full-spectrum goldens for signal classes.

Fresh implementation of the role of reference scripts/gen_reallife_refs.py.
Case grids replicate the reference's coverage (N=1024 @ 48 kHz):

* pure_sine: bin-centered k in {4,8,16,32,64} x amp {0.5,1,2};
  leakage tones {440,1000,2500} Hz; phase sweep {0,45,90,180,270} deg at k=8
* cosine: one bin-8 cosine (phase reference vs sine)
* multi_tone: two-tone (k 8/24, amps 1/0.5) + three-tone (k 4/16/48, amps .8/1/.3)
* chirp: 100 -> 2000 Hz linear
* special: impulse@0, impulse@N/2, DC, DC+sine(k=8), Nyquist, zeros,
  1e-12 and 1e6 amplitude sines at k=8
* windows_dsp: rect/hann/hamming/blackman at {64,256,1024,2048} with
  coherent gain (sum w / N) and ENBW (N sum w^2 / (sum w)^2)

Each case stores signal, fftRe/fftIm, magnitude, phase, peakBin (argmax
excluding DC unless the signal IS dc), peakMagnitude, peakPhase, params.

Usage: python scripts/gen_reallife_refs.py [--out-dir tests/fixtures/reallife]
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, List

import numpy as np
from scipy.signal import windows as sp_windows

from signal_defs import (
    cosine, dc, fft_golden, floats, generator_meta, impulse, linear_chirp,
    multi_tone, nyquist, peak_bin, sine, write_json,
)

SR = 48000.0
N = 1024


def case(name: str, kind: str, signal: np.ndarray, params: Dict[str, Any],
         sample_rate: float = SR) -> Dict[str, Any]:
    re, im = fft_golden(signal)
    mag = np.sqrt(re * re + im * im)
    ph = np.arctan2(im, re)
    pk = peak_bin(mag, exclude_dc=(kind != "dc"))
    return {
        "name": name, "kind": kind, "n": len(signal), "sampleRate": sample_rate,
        "signal": floats(signal), "fftRe": floats(re), "fftIm": floats(im),
        "magnitude": floats(mag), "phase": floats(ph),
        "peakBin": pk, "peakMagnitude": float(mag[pk]), "peakPhase": float(ph[pk]),
        "params": params,
    }


def bin_hz(k: int) -> float:
    return k * SR / N


def pure_sine_cases() -> List[Dict[str, Any]]:
    out = []
    for k in (4, 8, 16, 32, 64):
        for amp in (0.5, 1.0, 2.0):
            out.append(case(
                f"sine_bin{k}_amp{amp}", "pure_sine_bin_centered",
                sine(bin_hz(k), amp, 0.0, SR, N),
                {"frequency_hz": bin_hz(k), "amplitude": amp,
                 "phase_rad": 0.0, "bin_index": k}))
    for f in (440.0, 1000.0, 2500.0):
        out.append(case(
            f"sine_{int(f)}hz", "pure_sine_leakage", sine(f, 1.0, 0.0, SR, N),
            {"frequency_hz": f, "amplitude": 1.0, "phase_rad": 0.0,
             "expected_bin": round(f * N / SR)}))
    k = 8
    for deg in (0, 45, 90, 180, 270):
        rad = float(np.deg2rad(deg))
        out.append(case(
            f"sine_bin{k}_phase{deg}deg", "pure_sine_phase",
            sine(bin_hz(k), 1.0, rad, SR, N),
            {"frequency_hz": bin_hz(k), "amplitude": 1.0, "phase_rad": rad,
             "phase_deg": deg, "bin_index": k}))
    return out


def cosine_cases() -> List[Dict[str, Any]]:
    k = 8
    return [case(
        f"cosine_bin{k}", "cosine", cosine(bin_hz(k), 1.0, 0.0, SR, N),
        {"frequency_hz": bin_hz(k), "amplitude": 1.0, "phase_rad": 0.0,
         "bin_index": k})]


def multi_tone_cases() -> List[Dict[str, Any]]:
    out = []
    k1, k2 = 8, 24
    out.append(case(
        f"two_tone_bin{k1}_bin{k2}", "multi_tone",
        multi_tone([bin_hz(k1), bin_hz(k2)], [1.0, 0.5], [0.0, 0.0], SR, N),
        {"frequencies_hz": [bin_hz(k1), bin_hz(k2)], "amplitudes": [1.0, 0.5],
         "phases_rad": [0.0, 0.0], "bin_indices": [k1, k2]}))
    ks = (4, 16, 48)
    amps = [0.8, 1.0, 0.3]
    out.append(case(
        f"three_tone_bin{ks[0]}_bin{ks[1]}_bin{ks[2]}", "multi_tone",
        multi_tone([bin_hz(k) for k in ks], amps, [0.0] * 3, SR, N),
        {"frequencies_hz": [bin_hz(k) for k in ks], "amplitudes": amps,
         "phases_rad": [0.0] * 3, "bin_indices": list(ks)}))
    return out


def chirp_cases() -> List[Dict[str, Any]]:
    f0, f1 = 100.0, 2000.0
    return [case(
        f"chirp_{int(f0)}hz_to_{int(f1)}hz", "chirp",
        linear_chirp(f0, f1, SR, N),
        {"f0_hz": f0, "f1_hz": f1, "amplitude": 1.0})]


def special_cases() -> List[Dict[str, Any]]:
    out = []
    out.append(case("impulse_pos0", "impulse", impulse(N, 0, 1.0),
                    {"position": 0, "amplitude": 1.0}))
    out.append(case(f"impulse_pos{N // 2}", "impulse", impulse(N, N // 2, 1.0),
                    {"position": N // 2, "amplitude": 1.0}))
    out.append(case("dc_level1", "dc", dc(N, 1.0), {"level": 1.0}))
    k = 8
    out.append(case(
        f"dc_plus_sine_bin{k}", "dc_plus_sine",
        dc(N, 0.5) + sine(bin_hz(k), 1.0, 0.0, SR, N),
        {"dc_level": 0.5, "sine_frequency_hz": bin_hz(k),
         "sine_amplitude": 1.0, "sine_bin": k}))
    out.append(case("nyquist", "nyquist", nyquist(N, 1.0), {"amplitude": 1.0}))
    out.append(case("zeros", "zeros", np.zeros(N), {}))
    out.append(case("tiny_amplitude", "tiny", sine(bin_hz(8), 1e-12, 0.0, SR, N),
                    {"amplitude": 1e-12}))
    out.append(case("large_amplitude", "large", sine(bin_hz(8), 1e6, 0.0, SR, N),
                    {"amplitude": 1e6}))
    return out


def window_dsp_cases(sizes) -> List[Dict[str, Any]]:
    out = []
    for n in sizes:
        for wtype in ("rect", "hann", "hamming", "blackman"):
            if wtype == "rect":
                w = np.ones(n, dtype=np.float64)
            else:
                fn = {"hann": sp_windows.hann, "hamming": sp_windows.hamming,
                      "blackman": sp_windows.blackman}[wtype]
                w = fn(n, sym=True).astype(np.float64)
            out.append({
                "type": wtype, "n": n, "values": floats(w),
                "coherentGain": float(np.sum(w) / n),
                "enbw": float(n * np.sum(w * w) / np.sum(w) ** 2),
            })
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", default="tests/fixtures/reallife")
    args = p.parse_args()
    meta = generator_meta("scripts/gen_reallife_refs.py")

    groups = {
        "pure_sine": ("Pure sine wave test cases", pure_sine_cases()),
        "cosine": ("Cosine wave test cases for phase reference", cosine_cases()),
        "multi_tone": ("Multi-tone test cases", multi_tone_cases()),
        "chirp": ("Linear chirp test cases", chirp_cases()),
        "special": ("Special signals (impulse/DC/Nyquist/zeros/tiny/large)",
                    special_cases()),
    }
    for fname, (desc, cases) in groups.items():
        write_json(os.path.join(args.out_dir, f"{fname}.json.gz"), {
            **meta, "description": desc, "n": N, "sampleRate": SR,
            "cases": cases,
        })
        print(f"  {fname}: {len(cases)} cases")

    write_json(os.path.join(args.out_dir, "windows_dsp.json.gz"), {
        **meta, "description": "Window DSP properties (coherent gain, ENBW)",
        "cases": window_dsp_cases([64, 256, 1024, 2048]),
    })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
