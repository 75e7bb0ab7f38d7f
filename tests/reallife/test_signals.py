"""Real-life signal tests vs committed NumPy goldens
(reference test/reallife/signals.test.ts:12-197): full-vector FFT re/im,
magnitude, phase (where magnitude is significant, with 2-pi wrap handling),
round-trips, and the multi-tone N*A/2 peak law."""

import jax.numpy as jnp
import numpy as np

from pragma_dsp_tpu.core import ComplexArray, fft, ifft
from pragma_dsp_tpu.utils.fixtures import assert_close

ABS_TOL = 1e-9  # reference uses 1e-10 in f64; goldens cross numpy versions


def _fft_case(case):
    x = jnp.asarray(case["signal"], dtype=jnp.float64)
    return fft(x)


def test_fft_re_im_all_cases(all_signal_refs):
    for c in all_signal_refs:
        out = _fft_case(c)
        scale = max(1.0, float(np.max(np.abs(c["fftRe"])) +
                               np.max(np.abs(c["fftIm"]))))
        assert_close(c["fftRe"], np.asarray(out.real),
                     abs_tol=ABS_TOL * scale, label=f"{c['name']} re")
        assert_close(c["fftIm"], np.asarray(out.imag),
                     abs_tol=ABS_TOL * scale, label=f"{c['name']} im")


def test_magnitude_all_cases(all_signal_refs):
    for c in all_signal_refs:
        out = _fft_case(c)
        mag = np.hypot(np.asarray(out.real), np.asarray(out.imag))
        scale = max(1.0, float(np.max(c["magnitude"])))
        assert_close(c["magnitude"], mag, abs_tol=ABS_TOL * scale,
                     label=f"{c['name']} mag")


def test_phase_where_significant(all_signal_refs):
    # Phase is only meaningful where |X| is significant; compare modulo 2*pi
    # (reference signals.test.ts:39-49).
    for c in all_signal_refs:
        out = _fft_case(c)
        got = np.arctan2(np.asarray(out.imag), np.asarray(out.real))
        ref = np.asarray(c["phase"])
        magnitude = np.asarray(c["magnitude"])
        significant = magnitude > 1e-6 * max(1.0, magnitude.max())
        diff = np.abs(got[significant] - ref[significant])
        diff = np.minimum(diff, 2 * np.pi - diff)
        assert diff.size == 0 or diff.max() < 1e-6, (
            f"{c['name']}: max phase err {diff.max():.3e}")


def test_roundtrip_all_cases(all_signal_refs):
    for c in all_signal_refs:
        x = jnp.asarray(c["signal"], dtype=jnp.float64)
        rt = ifft(fft(x))
        scale = max(1.0, float(np.max(np.abs(c["signal"]))))
        assert_close(c["signal"], np.asarray(rt.real),
                     abs_tol=1e-10 * scale, label=f"{c['name']} roundtrip")


def test_peak_bin_matches_golden(all_signal_refs):
    for c in all_signal_refs:
        if c["kind"] in ("zeros",):
            continue
        out = _fft_case(c)
        mag = np.hypot(np.asarray(out.real), np.asarray(out.imag))
        if c["kind"] == "dc":
            got = int(np.argmax(mag))
        else:
            got = int(np.argmax(mag[1:])) + 1
        # Real signals have conjugate-symmetric spectra: the mirror bin
        # N-k ties with k to ~1 ulp, so accept either side of the tie as
        # long as the magnitude there matches the golden peak magnitude.
        mirror = (c["n"] - c["peakBin"]) % c["n"]
        assert got in (c["peakBin"], mirror), (
            f"{c['name']}: {got} not in {{{c['peakBin']}, {mirror}}}")
        assert abs(mag[got] - c["peakMagnitude"]) <= 1e-9 * max(
            1.0, c["peakMagnitude"]), c["name"]


def test_multi_tone_peak_law(multi_tone_refs):
    # Analytic law: bin-centered tone of amplitude A gives |X[k]| = N*A/2
    # (reference signals.test.ts:88-96).
    for c in multi_tone_refs["cases"]:
        out = _fft_case(c)
        mag = np.hypot(np.asarray(out.real), np.asarray(out.imag))
        n = c["n"]
        for k, a in zip(c["params"]["bin_indices"], c["params"]["amplitudes"]):
            expected = n * a / 2.0
            assert abs(mag[k] - expected) < 1e-6 * expected, (
                f"{c['name']} bin {k}: {mag[k]} vs {expected}")
