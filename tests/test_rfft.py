"""Real-input FFT tests: rfft/irfft numpy parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu.ops import irfft, rfft
from pragma_dsp_tpu.utils.fixtures import snr_db
from pragma_dsp_tpu.xform.fourier import window_values

RNG = np.random.default_rng(60)


@pytest.mark.slow
@pytest.mark.parametrize("n", [8, 64, 256, 1024])
def test_rfft_matches_numpy(n):
    x = RNG.standard_normal((3, n))
    out = rfft(jnp.asarray(x)).to_numpy_complex()
    ref = np.fft.rfft(x, axis=-1)
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-10 * max(1.0, np.abs(ref).max())


@pytest.mark.slow
@pytest.mark.parametrize("n", [8, 256, 1024])
def test_irfft_roundtrip(n):
    x = RNG.standard_normal((2, n))
    back = np.asarray(irfft(rfft(jnp.asarray(x)), n))
    np.testing.assert_allclose(back, x, atol=1e-10)


def test_irfft_matches_numpy():
    X = RNG.standard_normal((2, 129)) + 1j * RNG.standard_normal((2, 129))
    # enforce real-spectrum constraints at DC/Nyquist like numpy does
    from pragma_dsp_tpu.core import ComplexArray

    out = np.asarray(irfft(ComplexArray(jnp.asarray(X.real),
                                        jnp.asarray(X.imag)), 256))
    ref = np.fft.irfft(X, 256, axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-10)


def test_rfft_axis0():
    x = RNG.standard_normal((64, 5))
    out = rfft(jnp.asarray(x), axis=0).to_numpy_complex()
    ref = np.fft.rfft(x, axis=0)
    np.testing.assert_allclose(out, ref, atol=1e-10)


def test_rfft_rejects_bad_sizes():
    with pytest.raises(ValueError):
        rfft(jnp.zeros(12))
