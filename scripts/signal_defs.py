"""Shared signal constructors for the golden-fixture generators.

All signals are float64 numpy; goldens always come from NumPy/SciPy — never
from the framework under test (agent-first TDD, reference PLAN.md:144-167).
Signal grids replicate the coverage of the reference's generators
(reference scripts/gen_reallife_refs.py:53-455) so the committed data is
behaviourally interchangeable.
"""

from __future__ import annotations

import datetime as dt
import gzip
import json
import os
import platform
from typing import Any, Dict, List

import numpy as np


def time_axis(n: int, sample_rate: float) -> np.ndarray:
    return np.arange(n, dtype=np.float64) / sample_rate


def sine(freq_hz, amplitude, phase_rad, sample_rate, n) -> np.ndarray:
    t = time_axis(n, sample_rate)
    return amplitude * np.sin(2.0 * np.pi * freq_hz * t + phase_rad)


def cosine(freq_hz, amplitude, phase_rad, sample_rate, n) -> np.ndarray:
    t = time_axis(n, sample_rate)
    return amplitude * np.cos(2.0 * np.pi * freq_hz * t + phase_rad)


def multi_tone(freqs, amps, phases, sample_rate, n) -> np.ndarray:
    out = np.zeros(n, dtype=np.float64)
    for f, a, p in zip(freqs, amps, phases):
        out += sine(f, a, p, sample_rate, n)
    return out


def linear_chirp(f0, f1, sample_rate, n, amplitude=1.0) -> np.ndarray:
    t = time_axis(n, sample_rate)
    duration = n / sample_rate
    inst_phase = 2.0 * np.pi * (f0 * t + (f1 - f0) * t * t / (2.0 * duration))
    return amplitude * np.sin(inst_phase)


def impulse(n, position=0, amplitude=1.0) -> np.ndarray:
    out = np.zeros(n, dtype=np.float64)
    out[position] = amplitude
    return out


def dc(n, level=1.0) -> np.ndarray:
    return np.full(n, level, dtype=np.float64)


def nyquist(n, amplitude=1.0) -> np.ndarray:
    out = np.empty(n, dtype=np.float64)
    out[0::2] = amplitude
    out[1::2] = -amplitude
    return out


# ── golden-output helpers ────────────────────────────────────────────

def fft_golden(x: np.ndarray):
    X = np.fft.fft(x.astype(np.float64))
    return X.real, X.imag


def peak_bin(mag: np.ndarray, exclude_dc: bool = True) -> int:
    if exclude_dc and len(mag) > 1:
        return int(np.argmax(mag[1:])) + 1
    return int(np.argmax(mag))


# ── serialisation ────────────────────────────────────────────────────

def floats(arr) -> List[float]:
    return [float(v) for v in np.asarray(arr).tolist()]


def generator_meta(tool: str) -> Dict[str, Any]:
    import scipy

    return {
        "generatedAt": dt.datetime.now(dt.timezone.utc).replace(microsecond=0).isoformat(),
        "generator": tool,
        "python": platform.python_version(),
        "numpy": np.__version__,
        "scipy": scipy.__version__,
        "platform": platform.platform(),
    }


def write_json(path: str, payload: Dict[str, Any]) -> None:
    """Write JSON, gzipped when the path ends in .gz (keeps fixtures small)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    text = json.dumps(payload, indent=None, separators=(",", ":")) + "\n"
    if path.endswith(".gz"):
        with gzip.open(path, "wt", encoding="utf-8") as f:
            f.write(text)
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    print(f"wrote {path}")
