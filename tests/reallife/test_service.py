"""Service/stream parity tests (reference test/reallife/effect.test.ts:12-179):
spectrum_fx parity with spectrum(), cache-instance identity, streaming."""

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu import spectrum
from pragma_dsp_tpu.stream import (
    FourierService, spectrum_fx, spectrum_stream,
)


def _sig(case):
    return jnp.asarray(case["signal"], dtype=jnp.float64)


def test_spectrum_fx_parity_with_spectrum(pure_sine_refs):
    svc = FourierService()
    for c in pure_sine_refs["cases"][:5]:
        a = spectrum(_sig(c), sample_rate=c["sampleRate"], window="hann")
        b = spectrum_fx(_sig(c), service=svc, sample_rate=c["sampleRate"],
                        window="hann")
        np.testing.assert_array_equal(np.asarray(a.amplitude),
                                      np.asarray(b.amplitude))
        np.testing.assert_array_equal(np.asarray(a.phase), np.asarray(b.phase))
        assert int(a.peak.index) == int(b.peak.index)
        assert float(a.peak.amplitude) == float(b.peak.amplitude)


def test_fft_cache_identity():
    svc = FourierService()
    assert svc.fft(1024) is svc.fft(1024)
    assert svc.fft(1024) is not svc.fft(2048)


def test_window_cache_identity():
    svc = FourierService()
    assert svc.window("hann", 256) is svc.window("hann", 256)
    assert svc.window("hann", 256) is not svc.window("hamming", 256)
    assert svc.window("hann", 256) is not svc.window("hann", 512)


@pytest.mark.slow
def test_spectrum_stream_three_frames(pure_sine_refs):
    frames = [np.asarray(c["signal"], dtype=np.float32)
              for c in pure_sine_refs["cases"][:3]]
    results = list(spectrum_stream(iter(frames), sample_rate=48000.0))
    assert len(results) == 3
    for c, r in zip(pure_sine_refs["cases"][:3], results):
        assert int(r.peak.index) == c["params"]["bin_index"]


def test_spectrum_stream_empty():
    assert list(spectrum_stream(iter([]))) == []
