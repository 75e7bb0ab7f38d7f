"""FFT unit tests vs NumPy goldens (reference test/fft.test.ts:18-43)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu.core import ComplexArray, Radix2Fft, fft, ifft
from pragma_dsp_tpu.utils.fixtures import assert_close


def _cases(unit_fixtures, kind=None):
    for c in unit_fixtures["fftCases"]:
        if kind is None or c["kind"] == kind:
            yield c


def test_forward_matches_numpy(unit_fixtures):
    for c in _cases(unit_fixtures, "random_normal"):
        x = jnp.asarray(c["input"], dtype=jnp.float64)
        out = fft(x)
        assert_close(c["fftRe"], np.asarray(out.real), abs_tol=1e-6,
                     label=f"{c['name']} re")
        assert_close(c["fftIm"], np.asarray(out.imag), abs_tol=1e-6,
                     label=f"{c['name']} im")


def test_roundtrip(unit_fixtures):
    for c in _cases(unit_fixtures, "random_normal"):
        x = jnp.asarray(c["input"], dtype=jnp.float64)
        rt = ifft(fft(x))
        assert_close(c["input"], np.asarray(rt.real), abs_tol=1e-6,
                     label=f"{c['name']} rt re")
        assert_close(np.zeros(c["n"]), np.asarray(rt.imag), abs_tol=1e-6,
                     label=f"{c['name']} rt im")


def test_plan_class_validates():
    with pytest.raises(ValueError):
        Radix2Fft(12)
    plan = Radix2Fft(16)
    with pytest.raises(ValueError):
        plan.forward(jnp.zeros(8))


@pytest.mark.slow
def test_plan_forward_inverse(unit_fixtures):
    for c in _cases(unit_fixtures, "random_normal"):
        plan = Radix2Fft(c["n"])
        out = plan.forward(jnp.asarray(c["input"], dtype=jnp.float64))
        assert_close(c["fftRe"], np.asarray(out.real), abs_tol=1e-6)
        rt = plan.inverse(out)
        assert_close(c["input"], np.asarray(rt.real), abs_tol=1e-6)


def test_forward_complex_matches_numpy():
    rng = np.random.default_rng(7)
    z = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    out = fft(ComplexArray(jnp.asarray(z.real), jnp.asarray(z.imag)))
    ref = np.fft.fft(z)
    assert_close(ref.real, np.asarray(out.real), abs_tol=1e-10)
    assert_close(ref.imag, np.asarray(out.imag), abs_tol=1e-10)


@pytest.mark.slow
def test_batched_fft_matches_numpy():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((3, 5, 128))
    out = fft(jnp.asarray(x))
    ref = np.fft.fft(x, axis=-1)
    assert_close(ref.real, np.asarray(out.real), abs_tol=1e-9)
    assert_close(ref.imag, np.asarray(out.imag), abs_tol=1e-9)


@pytest.mark.slow
def test_fft_over_axis0():
    rng = np.random.default_rng(13)
    x = rng.standard_normal((64, 9))
    out = fft(jnp.asarray(x), axis=0)
    ref = np.fft.fft(x, axis=0)
    assert_close(ref.real, np.asarray(out.real), abs_tol=1e-9)
    assert_close(ref.imag, np.asarray(out.imag), abs_tol=1e-9)


def test_non_power_of_two_raises():
    with pytest.raises(ValueError):
        fft(jnp.zeros(12))


def test_plan_routes_through_dispatch():
    """Radix2Fft is built on ops.dispatch (round-1 VERDICT next-step #2):
    forcing the pallas impl must flow through the expert rung and agree
    with the portable stockham path (and numpy)."""
    from pragma_dsp_tpu.ops.dispatch import set_fft_impl

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    set_fft_impl("pallas")
    try:
        out_p = Radix2Fft(256).forward(x)
    finally:
        set_fft_impl("auto")
    out_s = Radix2Fft(256).forward(x)
    ref = np.fft.fft(np.asarray(x, np.float64), axis=-1)
    for out, label in ((out_p, "pallas"), (out_s, "auto")):
        assert_close(ref.real, np.asarray(out.real), abs_tol=1e-3,
                     label=f"{label} re")
        assert_close(ref.imag, np.asarray(out.imag), abs_tol=1e-3,
                     label=f"{label} im")
    np.testing.assert_allclose(np.asarray(out_p.real), np.asarray(out_s.real),
                               atol=2e-3)


@pytest.mark.slow
def test_pallas_precision_modes():
    """bf16x3 split-dot mode keeps >=100 dB SNR vs numpy f64 and the
    permuted->natural contract identical to the highest-precision path
    (ops/fft_pallas.py precision plumbing)."""
    from pragma_dsp_tpu.ops.fft_pallas import (
        fft_pallas, fft_pallas_permuted, ifft_pallas_from_permuted,
        permuted_to_natural)

    rng = np.random.default_rng(11)
    n = 512
    z = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    ref = np.fft.fft(z, axis=-1)
    xc = ComplexArray(jnp.asarray(z.real, jnp.float32),
                      jnp.asarray(z.imag, jnp.float32))

    def snr(ref_c, out):
        got = np.asarray(out.real) + 1j * np.asarray(out.imag)
        err = np.linalg.norm(got - ref_c)
        return 20 * np.log10(np.linalg.norm(ref_c) / max(err, 1e-300))

    for prec in ("highest", "bf16x3"):
        out = fft_pallas(xc, precision=prec)
        bound = 120.0 if prec == "highest" else 100.0
        assert snr(ref, out) > bound, (prec, snr(ref, out))
        p = fft_pallas_permuted(xc, precision=prec)
        nat_re = permuted_to_natural(p.real, n)
        np.testing.assert_allclose(nat_re, np.asarray(out.real), rtol=0,
                                   atol=0)
        rt = ifft_pallas_from_permuted(p, n, precision=prec)
        rt_c = np.asarray(rt.real) + 1j * np.asarray(rt.imag)
        err = np.linalg.norm(rt_c - z)
        assert 20 * np.log10(np.linalg.norm(z) / max(err, 1e-300)) > bound
