"""Direct unit tests for the fused circular-convolution kernel
(ops/conv_pallas.py), in interpreter mode on CPU.

Contract: y = ifft(fft(x) * H) under the numpy convention (reference
/root/reference/src/core/fft.ts:89-148 forward unnormalised / inverse
x 1/N), with H supplied in the digit-permuted (n//128, 128) layout of
fft_pallas_permuted. Round-2 VERDICT weak #5 / next-step #5: the kernel
previously had only transitive coverage through overlap_save_filter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pragma_dsp_tpu.core.complex import ComplexArray
from pragma_dsp_tpu.ops.conv_pallas import circular_convolve_pallas
from pragma_dsp_tpu.ops.fft_pallas import fft_pallas_permuted


pytestmark = pytest.mark.slow  # interpret-mode Pallas tier

def _hspec(h, n):
    hj = jnp.asarray(h, jnp.float32)
    return fft_pallas_permuted(ComplexArray(hj, jnp.zeros_like(hj)),
                               interpret=True, precision="highest")


def _np_circular(x, h):
    return np.real(np.fft.ifft(np.fft.fft(x, axis=-1)
                               * np.fft.fft(h), axis=-1))


def test_impulse_is_identity():
    n = 256
    h = np.zeros(n, np.float64)
    h[0] = 1.0
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, n)).astype(np.float32)
    y = circular_convolve_pallas(jnp.asarray(x), _hspec(h, n), n,
                                 interpret=True, precision="highest")
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-5)


def test_shifted_impulse_rolls():
    n = 256
    h = np.zeros(n, np.float64)
    h[3] = 1.0
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, n)).astype(np.float32)
    y = circular_convolve_pallas(jnp.asarray(x), _hspec(h, n), n,
                                 interpret=True, precision="highest")
    np.testing.assert_allclose(np.asarray(y), np.roll(x, 3, axis=-1),
                               atol=2e-5)


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_matches_numpy_circular_convolution(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n))
    h = np.zeros(n)
    k = 127
    h[:k] = rng.standard_normal(k) / k
    ref = _np_circular(x, h)
    y = np.asarray(circular_convolve_pallas(
        jnp.asarray(x, jnp.float32), _hspec(h, n), n,
        interpret=True, precision="highest"), np.float64)
    snr = 10 * np.log10((ref ** 2).sum() / ((y - ref) ** 2).sum())
    assert snr >= 125.0, f"n={n}: SNR {snr:.1f} dB"


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_bf16x3_snr(n):
    """Production fast path must clear the 105 dB gate at every block size."""
    rng = np.random.default_rng(n + 1)
    x = rng.standard_normal((3, n))
    h = np.zeros(n)
    h[:127] = np.hamming(127) / np.hamming(127).sum()
    ref = _np_circular(x, h)
    y = np.asarray(circular_convolve_pallas(
        jnp.asarray(x, jnp.float32), _hspec(h, n), n,
        interpret=True, precision="bf16x3"), np.float64)
    snr = 10 * np.log10((ref ** 2).sum() / ((y - ref) ** 2).sum())
    assert snr >= 105.0, f"n={n}: SNR {snr:.1f} dB"


@pytest.mark.parametrize("k", [129, 200, 257])
def test_lane_aligned_overlap_edges(k):
    """Overlap-save edges around the 128-lane rounding: k-1 = 128 exactly,
    128 < k-1 < 256, and k-1 = 256 exactly (ops/fir.py rounds the
    overlap up to a LANES multiple on the fused path)."""
    from pragma_dsp_tpu.ops.dispatch import set_fft_impl
    from pragma_dsp_tpu.ops.fir import overlap_save_filter

    rng = np.random.default_rng(k)
    x = rng.standard_normal(6000).astype(np.float32)
    taps = (rng.standard_normal(k) / k).astype(np.float32)
    ref = np.convolve(np.asarray(x, np.float64),
                      np.asarray(taps, np.float64))[:x.shape[0]]
    set_fft_impl("pallas")
    try:
        y = np.asarray(overlap_save_filter(
            jnp.asarray(x), jnp.asarray(taps), precision="highest"),
            np.float64)
    finally:
        set_fft_impl("auto")
    snr = 10 * np.log10((ref ** 2).sum() / ((y - ref) ** 2).sum())
    assert snr >= 120.0, f"k={k}: SNR {snr:.1f} dB"


def test_rejects_natural_order_spectrum():
    """A natural-order (n,) spectrum must be rejected, not silently
    reshaped into the wrong filter (round-2 ADVICE conv_pallas.py:180)."""
    n = 256
    h = np.zeros(n, np.float32)
    h[0] = 1.0
    bad = ComplexArray(jnp.asarray(np.fft.fft(h).real, jnp.float32),
                       jnp.asarray(np.fft.fft(h).imag, jnp.float32))
    x = jnp.zeros((2, n), jnp.float32)
    with pytest.raises(ValueError, match="digit-permuted"):
        circular_convolve_pallas(x, bad, n, interpret=True)


def test_rejects_small_or_non_pow2():
    x = jnp.zeros((2, 128), jnp.float32)
    h = ComplexArray(jnp.zeros((1, 128)), jnp.zeros((1, 128)))
    with pytest.raises(ValueError):
        circular_convolve_pallas(x, h, 128, interpret=True)


def test_donate_matches():
    n = 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    h = np.zeros(n)
    h[:63] = rng.standard_normal(63)
    hs = _hspec(h, n)
    a = circular_convolve_pallas(x, hs, n, interpret=True,
                                 precision="highest", donate=False)
    b = circular_convolve_pallas(x, hs, n, interpret=True,
                                 precision="highest", donate=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
