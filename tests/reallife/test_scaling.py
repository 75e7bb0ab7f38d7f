"""Amplitude-scaling-law tests (reference test/reallife/scaling.test.ts:5-203):
one/two-sided scaling, DC/Nyquist never doubled, exact frequency axis,
DC-ignoring peak detection."""

import jax.numpy as jnp
import numpy as np

from pragma_dsp_tpu import spectrum
from pragma_dsp_tpu.xform import bin_frequencies


def _spec(case, **kw):
    return spectrum(jnp.asarray(case["signal"], dtype=jnp.float64),
                    sample_rate=case["sampleRate"], **kw)


def test_one_sided_peak_amplitude_is_a(pure_sine_refs):
    for c in pure_sine_refs["cases"]:
        if c["kind"] != "pure_sine_bin_centered":
            continue
        r = _spec(c)
        a = c["params"]["amplitude"]
        assert abs(float(r.peak.amplitude) - a) < 1e-9 * max(1.0, a), c["name"]


def test_two_sided_peak_amplitude_is_half_a(pure_sine_refs):
    for c in pure_sine_refs["cases"]:
        if c["kind"] != "pure_sine_bin_centered":
            continue
        r = _spec(c, sides="two")
        a = c["params"]["amplitude"]
        k = c["params"]["bin_index"]
        amp = np.asarray(r.amplitude)
        n = c["n"]
        assert abs(amp[k] - a / 2) < 1e-9, c["name"]
        assert abs(amp[n - k] - a / 2) < 1e-9, c["name"]


def test_dc_not_doubled(special_refs):
    c = next(c for c in special_refs["cases"] if c["kind"] == "dc")
    r = _spec(c)
    # DC level 1.0 must appear as exactly 1.0 (divided by N, not 2/N)
    assert abs(float(np.asarray(r.amplitude)[0]) - 1.0) < 1e-9


def test_dc_plus_sine_scaling(special_refs):
    c = next(c for c in special_refs["cases"] if c["kind"] == "dc_plus_sine")
    r = _spec(c)
    amp = np.asarray(r.amplitude)
    assert abs(amp[0] - c["params"]["dc_level"]) < 1e-9
    assert abs(amp[c["params"]["sine_bin"]] - c["params"]["sine_amplitude"]) < 1e-9


def test_nyquist_not_doubled(special_refs):
    c = next(c for c in special_refs["cases"] if c["kind"] == "nyquist")
    r = _spec(c)
    amp = np.asarray(r.amplitude)
    n = c["n"]
    # Alternating +/-A puts all energy at bin N/2 with |X| = N*A -> amp = A.
    assert abs(amp[n // 2] - c["params"]["amplitude"]) < 1e-9


def test_frequency_axis_exact():
    for n in (256, 1024, 4096):
        for sr in (1.0, 48000.0):
            one = np.asarray(bin_frequencies(n, sr, "one", dtype=np.float64))
            two = np.asarray(bin_frequencies(n, sr, "two", dtype=np.float64))
            assert one.shape[0] == n // 2 + 1 and two.shape[0] == n
            np.testing.assert_allclose(one, np.arange(n // 2 + 1) * sr / n,
                                       rtol=0, atol=0)
            np.testing.assert_allclose(two, np.arange(n) * sr / n,
                                       rtol=0, atol=0)


def test_peak_detection_ignores_dc(special_refs):
    c = next(c for c in special_refs["cases"] if c["kind"] == "dc_plus_sine")
    r = _spec(c)
    # DC (0.5) is smaller than the sine (1.0) here, but even so the peak
    # rule must pick the sine bin, not DC.
    assert int(r.peak.index) == c["params"]["sine_bin"]


def test_peak_on_pure_dc_falls_back_to_dc(special_refs):
    c = next(c for c in special_refs["cases"] if c["kind"] == "dc")
    r = _spec(c)
    # All non-DC bins are ~0 but float noise can make some > 0; the
    # reference rule then picks a non-DC bin. Replicate exactly:
    amp = np.asarray(r.amplitude)
    if np.any(amp[1:] > 0):
        expected = 1 + int(np.argmax(amp[1:]))
    else:
        expected = int(np.argmax(amp))
    assert int(r.peak.index) == expected


def test_peak_prefers_largest_non_dc_bin(pure_sine_refs):
    for c in pure_sine_refs["cases"]:
        if c["kind"] != "pure_sine_bin_centered":
            continue
        r = _spec(c)
        assert int(r.peak.index) == c["params"]["bin_index"], c["name"]
        expected_hz = c["params"]["frequency_hz"]
        assert abs(float(r.peak.frequency) - expected_hz) < 1e-6
