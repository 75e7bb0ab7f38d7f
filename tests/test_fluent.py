"""Fluent chain tests (reference test/fluent/chain.test.ts): typestate
round-trips, NonZero, inverse_checked, freq-domain convolution."""

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu.core import ComplexArray
from pragma_dsp_tpu.fluent import (
    NonZero, NotInvertibleError, as_non_zero, assert_non_zero, chain,
)
from pragma_dsp_tpu.xform import FluentFFT

RNG = np.random.default_rng(3)


def _signal(n=64):
    return RNG.standard_normal(n)


def test_non_zero_brand():
    s = assert_non_zero(2.0)
    assert isinstance(s, NonZero) and float(s) == 2.0
    with pytest.raises(ValueError):
        assert_non_zero(0.0)
    assert as_non_zero(0.0) is None
    assert float(as_non_zero(-3.0)) == -3.0


def test_forward_scale_inverse_roundtrip():
    x = _signal()
    f = FluentFFT(len(x))
    s = assert_non_zero(2.0)
    out = f.forward(jnp.asarray(x)).scale(s).scale(assert_non_zero(0.5)).inverse()
    np.testing.assert_allclose(np.asarray(out.real), x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.imag), 0, atol=1e-10)


def test_conj_preserves_invertibility():
    x = _signal()
    f = FluentFFT(len(x))
    c = f.forward(jnp.asarray(x)).conj().conj()
    assert c.state.invert == "yes"
    out = c.inverse()
    np.testing.assert_allclose(np.asarray(out.real), x, atol=1e-10)


def test_plain_scale_downgrades_to_maybe():
    x = _signal()
    f = FluentFFT(len(x))
    c = f.forward(jnp.asarray(x)).scale(3.0)
    assert c.state.invert == "maybe"
    with pytest.raises(NotInvertibleError):
        c.inverse()
    res = c.inverse_checked()
    assert res.ok
    np.testing.assert_allclose(np.asarray(res.value.real), 3.0 * x, atol=1e-9)


def test_mul_scalar_overloads():
    x = _signal()
    f = FluentFFT(len(x))
    keeps = f.forward(jnp.asarray(x)).mul_scalar(assert_non_zero(2.0), 0.0)
    assert keeps.state.invert == "yes"
    downgraded = f.forward(jnp.asarray(x)).mul_scalar(2.0, 0.0)
    assert downgraded.state.invert == "maybe"


def test_chain_without_fft_has_no_inverse():
    z = RNG.standard_normal(8) + 1j * RNG.standard_normal(8)
    c = chain(ComplexArray(jnp.asarray(z.real), jnp.asarray(z.imag)))
    with pytest.raises(NotInvertibleError):
        c.inverse()
    res = c.inverse_checked()
    assert not res.ok and res.error.tag == "NoFftContext"


def test_terminal_projections():
    z = RNG.standard_normal(8) + 1j * RNG.standard_normal(8)
    c = chain(ComplexArray(jnp.asarray(z.real), jnp.asarray(z.imag)))
    np.testing.assert_allclose(np.asarray(c.mag()), np.abs(z), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c.arg()), np.angle(z), rtol=1e-12)


def test_clone_is_independent_state():
    x = _signal()
    f = FluentFFT(len(x))
    c = f.forward(jnp.asarray(x))
    c2 = c.clone().scale(5.0)
    assert c.state.invert == "yes" and c2.state.invert == "maybe"


def test_freq_domain_convolution():
    # Circular convolution via FFT: ifft(fft(x) * fft(h)) == circconv(x, h)
    n = 32
    x = RNG.standard_normal(n)
    h = RNG.standard_normal(n)
    f = FluentFFT(n)
    H = f.forward(jnp.asarray(h)).unwrap()
    out = f.forward(jnp.asarray(x)).mul(H).inverse_checked()
    assert out.ok
    ref = np.real(np.fft.ifft(np.fft.fft(x) * np.fft.fft(h)))
    np.testing.assert_allclose(np.asarray(out.value.real), ref, atol=1e-9)


def test_add_sub_roundtrip_via_checked():
    x = _signal(16)
    f = FluentFFT(16)
    other = f.forward(jnp.asarray(np.zeros(16))).unwrap()
    c = f.forward(jnp.asarray(x)).add(other).sub(other)
    assert c.state.invert == "maybe"
    res = c.inverse_checked()
    assert res.ok
    np.testing.assert_allclose(np.asarray(res.value.real), x, atol=1e-10)
