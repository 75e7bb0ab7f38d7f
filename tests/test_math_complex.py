"""Pure complex-math op tests (reference test/math/complex.test.ts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu.core import ComplexArray
from pragma_dsp_tpu.math import (
    add, arg, conj, copy, div, div_scalar, mag, mul, mul_scalar, scale, sub, zero,
)

RNG = np.random.default_rng(42)


def _pair(n=16):
    a = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    b = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    return a, b


def _ca(z):
    return ComplexArray(jnp.asarray(z.real), jnp.asarray(z.imag))


def _np(c: ComplexArray):
    return np.asarray(c.real) + 1j * np.asarray(c.imag)


@pytest.mark.parametrize("op,npop", [
    (add, lambda a, b: a + b),
    (sub, lambda a, b: a - b),
    (mul, lambda a, b: a * b),
    (div, lambda a, b: a / b),
])
def test_binary_ops(op, npop):
    a, b = _pair()
    got = _np(op(_ca(a), _ca(b)))
    np.testing.assert_allclose(got, npop(a, b), rtol=1e-12)


def test_scale():
    a, _ = _pair()
    np.testing.assert_allclose(_np(scale(_ca(a), 2.5)), a * 2.5, rtol=1e-12)


def test_mul_scalar():
    a, _ = _pair()
    np.testing.assert_allclose(_np(mul_scalar(_ca(a), 1.5, -0.5)),
                               a * (1.5 - 0.5j), rtol=1e-12)


def test_div_scalar_matches_reference_formula():
    # Reference implements divScalar as multiply-by-inverse (complex.ts:172-182)
    a, _ = _pair()
    re, im = 3.0, -4.0
    denom = re * re + im * im
    expected = a * complex(re / denom, -im / denom)
    np.testing.assert_allclose(_np(div_scalar(_ca(a), re, im)), expected,
                               rtol=1e-12)


def test_conj_mag_arg():
    a, _ = _pair()
    np.testing.assert_allclose(_np(conj(_ca(a))), np.conj(a), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(mag(_ca(a))), np.abs(a), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(arg(_ca(a))), np.angle(a), rtol=1e-12)


def test_copy_zero():
    a, _ = _pair()
    c = _ca(a)
    np.testing.assert_array_equal(_np(copy(c)), a)
    np.testing.assert_array_equal(_np(zero(c)), np.zeros_like(a))


def test_mag_hypot_overflow_safe():
    # hypot semantics: no overflow at 1e200 components (f64)
    c = ComplexArray(jnp.asarray([1e200]), jnp.asarray([1e200]))
    assert np.isfinite(float(mag(c)[0]))


def test_batched_broadcast():
    a = RNG.standard_normal((4, 8)) + 1j * RNG.standard_normal((4, 8))
    b = RNG.standard_normal((4, 8)) + 1j * RNG.standard_normal((4, 8))
    np.testing.assert_allclose(_np(mul(_ca(a), _ca(b))), a * b, rtol=1e-12)
