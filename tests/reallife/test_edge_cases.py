"""Edge-case tests (reference test/reallife/edge_cases.test.ts:6-237):
zeros exact-0, impulse flat spectrum, tiny (1e-12) and large (1e6)
amplitudes, zero-padding semantics, round-trip for every special signal."""

import jax.numpy as jnp
import numpy as np

from pragma_dsp_tpu import spectrum
from pragma_dsp_tpu.core import fft, ifft
from pragma_dsp_tpu.utils.fixtures import assert_close


def _case(refs, kind):
    return next(c for c in refs["cases"] if c["kind"] == kind)


def _named(refs, name):
    return next(c for c in refs["cases"] if c["name"] == name)


def test_zeros_fft_exactly_zero(special_refs):
    c = _case(special_refs, "zeros")
    out = fft(jnp.asarray(c["signal"], dtype=jnp.float64))
    assert float(np.abs(np.asarray(out.real)).max()) == 0.0
    assert float(np.abs(np.asarray(out.imag)).max()) == 0.0


def test_impulse_flat_spectrum(special_refs):
    c = _named(special_refs, "impulse_pos0")
    out = fft(jnp.asarray(c["signal"], dtype=jnp.float64))
    mag = np.hypot(np.asarray(out.real), np.asarray(out.imag))
    # Impulse at 0: X[k] = 1 for all k, exactly flat.
    assert_close(np.ones(c["n"]), mag, abs_tol=1e-12, label="impulse flat")


def test_impulse_middle_alternating_sign(special_refs):
    c = _named(special_refs, f"impulse_pos{c_n(special_refs) // 2}")
    out = fft(jnp.asarray(c["signal"], dtype=jnp.float64))
    assert_close(c["fftRe"], np.asarray(out.real), abs_tol=1e-9)
    assert_close(c["fftIm"], np.asarray(out.imag), abs_tol=1e-9)


def c_n(refs):
    return refs["cases"][0]["n"]


def test_tiny_amplitude(special_refs):
    c = _case(special_refs, "tiny")
    out = fft(jnp.asarray(c["signal"], dtype=jnp.float64))
    # 1e-12 amplitudes: absolute error bound 1e-20 (edge_cases.test.ts:146)
    assert_close(c["fftRe"], np.asarray(out.real), abs_tol=1e-20)
    assert_close(c["fftIm"], np.asarray(out.imag), abs_tol=1e-20)


def test_large_amplitude_relative(special_refs):
    c = _case(special_refs, "large")
    out = fft(jnp.asarray(c["signal"], dtype=jnp.float64))
    # 1e6 amplitudes: 1e-9 RELATIVE error (edge_cases.test.ts:166-175)
    scale = float(np.max(np.abs(c["fftRe"])) + np.max(np.abs(c["fftIm"])))
    assert_close(c["fftRe"], np.asarray(out.real), abs_tol=1e-9 * scale)
    assert_close(c["fftIm"], np.asarray(out.imag), abs_tol=1e-9 * scale)


def test_zero_padding_semantics():
    # spectrum() zero-pads to fft_size; spectrum of padded == fft of
    # explicit zero-padded input.
    rng = np.random.default_rng(5)
    x = rng.standard_normal(300)
    r = spectrum(jnp.asarray(x), fft_size=512)
    padded = np.zeros(512)
    padded[:300] = x
    ref = np.fft.fft(padded)
    mag = np.abs(ref)[: 512 // 2 + 1]
    k = np.arange(512 // 2 + 1)
    factor = np.where((k == 0) | (k == 256), 1 / 512, 2 / 512)
    np.testing.assert_allclose(np.asarray(r.amplitude), mag * factor,
                               atol=1e-9)


def test_truncation_semantics():
    rng = np.random.default_rng(6)
    x = rng.standard_normal(1000)
    r = spectrum(jnp.asarray(x), fft_size=256)
    ref = np.fft.fft(x[:256])
    mag = np.abs(ref)[:129]
    k = np.arange(129)
    factor = np.where((k == 0) | (k == 128), 1 / 256, 2 / 256)
    np.testing.assert_allclose(np.asarray(r.amplitude), mag * factor,
                               atol=1e-9)


def test_roundtrip_every_special_signal(special_refs):
    for c in special_refs["cases"]:
        x = jnp.asarray(c["signal"], dtype=jnp.float64)
        rt = ifft(fft(x))
        scale = max(1.0, float(np.max(np.abs(c["signal"]))))
        assert_close(c["signal"], np.asarray(rt.real),
                     abs_tol=1e-10 * scale, label=c["name"])
        assert_close(np.zeros(c["n"]), np.asarray(rt.imag),
                     abs_tol=1e-10 * scale, label=c["name"] + " imag")


def test_window_dsp_properties(windows_dsp_refs):
    from pragma_dsp_tpu.xform.fourier import window_values

    for c in windows_dsp_refs["cases"]:
        w = window_values(c["type"], c["n"])
        cg = float(np.sum(w) / c["n"])
        enbw = float(c["n"] * np.sum(w * w) / np.sum(w) ** 2)
        assert abs(cg - c["coherentGain"]) < 1e-12, (c["type"], c["n"])
        assert abs(enbw - c["enbw"]) < 1e-12, (c["type"], c["n"])
        assert_close(c["values"], w, abs_tol=1e-8,
                     label=f"{c['type']} n={c['n']}")
