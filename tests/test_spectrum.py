"""Beginner spectrum() tests on the bin-centered sine fixture
(reference test/spectrum.test.ts:5-35)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu import spectrum


def _sine_case(unit_fixtures):
    for c in unit_fixtures["fftCases"]:
        if c["kind"] == "sine_bin_centered":
            return c
    raise AssertionError("missing sine fixture")


def test_peak_bin_and_frequency(unit_fixtures):
    c = _sine_case(unit_fixtures)
    r = spectrum(jnp.asarray(c["input"], dtype=jnp.float64),
                 sample_rate=c["sampleRate"])
    assert int(r.peak.index) == c["meta"]["binCenteredK"]
    assert abs(float(r.peak.frequency) - c["meta"]["expectedPeakHz"]) < 1e-6


def test_peak_amplitude(unit_fixtures):
    c = _sine_case(unit_fixtures)
    r = spectrum(jnp.asarray(c["input"], dtype=jnp.float64),
                 sample_rate=c["sampleRate"])
    assert abs(float(r.peak.amplitude) - c["meta"]["amplitude"]) < 1e-3


def test_default_fft_size_pads_to_next_pow2():
    x = jnp.asarray(np.ones(100), dtype=jnp.float64)
    r = spectrum(x)
    assert r.amplitude.shape[-1] == 128 // 2 + 1


@pytest.mark.slow
def test_batched_spectrum_matches_loop(unit_fixtures):
    c = _sine_case(unit_fixtures)
    x = np.asarray(c["input"])
    batch = np.stack([x, 2.0 * x, np.roll(x, 5)])
    rb = spectrum(jnp.asarray(batch), sample_rate=c["sampleRate"])
    for i in range(3):
        ri = spectrum(jnp.asarray(batch[i]), sample_rate=c["sampleRate"])
        np.testing.assert_allclose(np.asarray(rb.amplitude[i]),
                                   np.asarray(ri.amplitude), rtol=0, atol=1e-12)
        assert int(rb.peak.index[i]) == int(ri.peak.index)
