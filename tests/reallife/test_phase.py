"""DSP phase-semantics tests (reference test/reallife/phase.test.ts:6-162):
cosine leads sine by pi/2, phase-swept sines, spectrum peak phase, DC phase."""

import jax.numpy as jnp
import numpy as np

from pragma_dsp_tpu import spectrum
from pragma_dsp_tpu.core import fft


def _phase_at(case, k):
    out = fft(jnp.asarray(case["signal"], dtype=jnp.float64))
    return float(np.arctan2(np.asarray(out.imag)[k], np.asarray(out.real)[k]))


def _wrap(d):
    return (d + np.pi) % (2 * np.pi) - np.pi


def test_cosine_leads_sine_by_half_pi(pure_sine_refs, cosine_refs):
    sine_case = next(c for c in pure_sine_refs["cases"]
                     if c["name"] == "sine_bin8_amp1.0")
    cos_case = cosine_refs["cases"][0]
    k = 8
    diff = _wrap(_phase_at(cos_case, k) - _phase_at(sine_case, k))
    assert abs(diff - np.pi / 2) < 1e-6


def test_phase_sweep_matches_golden(pure_sine_refs):
    for c in pure_sine_refs["cases"]:
        if c["kind"] != "pure_sine_phase":
            continue
        k = c["params"]["bin_index"]
        got = _phase_at(c, k)
        assert abs(_wrap(got - c["phase"][k])) < 1e-9, c["name"]


def test_phase_theory_for_swept_sines(pure_sine_refs):
    # A*sin(2*pi*f*t + phi) has X[k] phase = phi - pi/2 (bin-centered).
    for c in pure_sine_refs["cases"]:
        if c["kind"] != "pure_sine_phase":
            continue
        k = c["params"]["bin_index"]
        expected = _wrap(c["params"]["phase_rad"] - np.pi / 2)
        assert abs(_wrap(_phase_at(c, k) - expected)) < 1e-9, c["name"]


def test_spectrum_peak_phase(pure_sine_refs):
    c = next(c for c in pure_sine_refs["cases"]
             if c["name"] == "sine_bin16_amp1.0")
    r = spectrum(jnp.asarray(c["signal"], dtype=jnp.float64),
                 sample_rate=c["sampleRate"])
    assert int(r.peak.index) == 16
    # sin with phase 0 -> spectral phase -pi/2 at the peak bin
    assert abs(float(r.peak.phase) + np.pi / 2) < 1e-6


def test_dc_phase_zero_or_pi(special_refs):
    c = next(c for c in special_refs["cases"] if c["kind"] == "dc")
    ph = _phase_at(c, 0)
    assert abs(ph) < 1e-9 or abs(abs(ph) - np.pi) < 1e-9
