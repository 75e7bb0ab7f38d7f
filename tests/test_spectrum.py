"""Beginner spectrum() tests on the bin-centered sine fixture
(reference test/spectrum.test.ts:5-35)."""

import jax
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


def test_bf16_input_rides_f32_pipeline():
    """bf16 samples upcast to f32 (round-4 VERDICT #9): the result is
    bit-identical to feeding the f32 value of the same bf16 data, so on
    TPU the beginner rung always hits the fused kernel path."""
    rng = np.random.default_rng(12)
    x16 = jnp.asarray(rng.standard_normal(256), jnp.bfloat16)
    r16 = spectrum(x16, sample_rate=48000.0, window="hann")
    r32 = spectrum(x16.astype(jnp.float32), sample_rate=48000.0,
                   window="hann")
    assert r16.amplitude.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(r16.amplitude),
                                  np.asarray(r32.amplitude))
    np.testing.assert_array_equal(np.asarray(r16.phase),
                                  np.asarray(r32.phase))
    # and the fused-path predicate accepts what spectrum() now passes it
    from pragma_dsp_tpu.public.spectrum import _use_fused_one_sided
    assert _use_fused_one_sided(x16.astype(jnp.float32), 256, "one") \
        == (jax.default_backend() == "tpu")
