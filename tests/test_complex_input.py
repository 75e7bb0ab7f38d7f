"""Complex-dtype JAX input must be split, never silently coerced.

Round-4 VERDICT #1: ``as_complex_array`` split *numpy* complex input but a
``jnp.complex64/128`` array fell through to the real-coercion branch —
``ops.fft`` returned wrong bins with no error. The reference validates every
input (src/core/fft.ts:95-104); a fixtures-first framework must never return
silent wrong answers. These tests feed complex-dtype JAX arrays through every
public entry point and pin the guard that makes the bug unconstructible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from pragma_dsp_tpu import ops
from pragma_dsp_tpu.core import ComplexArray, as_complex_array
from pragma_dsp_tpu.models import wbfm_demod
from pragma_dsp_tpu.ops.channelizer import pfb_channelize
from pragma_dsp_tpu.ops.fir import fir_filter
from pragma_dsp_tpu.parallel import (
    data_mesh, dist_fft, dist_fft_shape, permuted_to_natural_host,
    sharded_fir_filter,
)
from pragma_dsp_tpu.public import spectrum
from pragma_dsp_tpu.utils.fixtures import assert_snr

RNG = np.random.default_rng(77)


def _complex_signal(shape, dtype=np.complex128):
    z = RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)
    return z.astype(dtype)


# ---------------------------------------------------------------- core


def test_as_complex_array_splits_jnp_complex64():
    z = _complex_signal(16, np.complex64)
    ca = as_complex_array(jnp.asarray(z))
    assert ca.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(ca.real), z.real, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ca.imag), z.imag, rtol=1e-6)


def test_as_complex_array_splits_jnp_complex128():
    z = _complex_signal(16)
    ca = as_complex_array(jnp.asarray(z))
    assert ca.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(ca.real), z.real, rtol=0)
    np.testing.assert_allclose(np.asarray(ca.imag), z.imag, rtol=0)


def test_as_complex_array_dtype_override_on_complex():
    z = jnp.asarray(_complex_signal(8))
    ca = as_complex_array(z, dtype=jnp.float32)
    assert ca.dtype == jnp.float32


def test_as_complex_array_python_complex_list():
    ca = as_complex_array([1 + 2j, 3 - 4j])
    np.testing.assert_allclose(np.asarray(ca.real), [1.0, 3.0])
    np.testing.assert_allclose(np.asarray(ca.imag), [2.0, -4.0])


def test_complex_array_rejects_complex_planes():
    with pytest.raises(TypeError, match="complex dtype"):
        ComplexArray(jnp.asarray([1 + 1j]), jnp.zeros(1))
    with pytest.raises(TypeError, match="complex dtype"):
        ComplexArray(jnp.zeros(1), jnp.asarray([1j]))


def test_complex_array_guard_tolerates_pytree_placeholders():
    # Pytree transposes/unflattens may route non-array placeholders
    # through the constructor; only an actual complex dtype must raise.
    leaves, treedef = jax.tree_util.tree_flatten(
        ComplexArray(jnp.zeros(4), jnp.zeros(4)))
    rebuilt = jax.tree_util.tree_unflatten(treedef, [object(), object()])
    assert isinstance(rebuilt, ComplexArray)


# ---------------------------------------------------------------- ops.fft


def test_fft_jnp_complex_matches_numpy():
    # The round-4 repro verbatim: this returned wrong bins silently.
    z = jnp.asarray([1 + 2j, 3 - 4j, 1j, 2 + 0j])
    got = ops.fft(z).to_numpy_complex()
    want = np.fft.fft(np.asarray([1 + 2j, 3 - 4j, 1j, 2 + 0j]))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n", [64, 1024])
def test_fft_ifft_complex128_roundtrip(n):
    z = _complex_signal(n)
    zj = jnp.asarray(z)
    spec = ops.fft(zj).to_numpy_complex()
    np.testing.assert_allclose(spec, np.fft.fft(z), atol=1e-9)
    rt = ops.ifft(ops.fft(zj)).to_numpy_complex()
    np.testing.assert_allclose(rt, z, atol=1e-10)


def test_fft_complex_inside_jit():
    z = _complex_signal(256, np.complex64)

    @jax.jit
    def f(w):
        out = ops.fft(w)
        return out.real, out.imag

    re, im = f(jnp.asarray(z))
    want = np.fft.fft(z.astype(np.complex128))
    assert_snr(want.real, np.asarray(re), 120.0)
    assert_snr(want.imag, np.asarray(im), 120.0)


# --------------------------------------------------------------- DSP ops


def test_fir_filter_jnp_complex_matches_scipy():
    taps = sps.firwin(31, 0.25)
    z = _complex_signal(512)
    out = fir_filter(jnp.asarray(z), jnp.asarray(taps))
    want = sps.lfilter(taps, 1.0, z)
    assert isinstance(out, ComplexArray)
    np.testing.assert_allclose(out.real, want.real, atol=1e-10)
    np.testing.assert_allclose(out.imag, want.imag, atol=1e-10)


def test_pfb_channelize_jnp_complex_matches_split():
    C, M = 16, 32
    z = _complex_signal(C * M)
    got = pfb_channelize(jnp.asarray(z), C)
    want = pfb_channelize(ComplexArray(jnp.asarray(z.real),
                                       jnp.asarray(z.imag)), C)
    np.testing.assert_allclose(got.real, want.real, atol=0)
    np.testing.assert_allclose(got.imag, want.imag, atol=0)


def test_wbfm_demod_jnp_complex_matches_split():
    fs = 2.4e6
    n = int(fs * 0.005)
    t = np.arange(n) / fs
    msg = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    iq = np.exp(1j * (2 * np.pi * 75e3 * np.cumsum(msg) / fs))
    got = np.asarray(wbfm_demod(jnp.asarray(iq)))
    want = np.asarray(wbfm_demod(ComplexArray(jnp.asarray(iq.real),
                                              jnp.asarray(iq.imag))))
    np.testing.assert_allclose(got, want, atol=0)


def test_spectrum_rejects_complex_input():
    with pytest.raises(TypeError, match="real samples"):
        spectrum(jnp.asarray(_complex_signal(64, np.complex64)))


# --------------------------------------------------------------- sharded


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return data_mesh(8)


def test_dist_fft_jnp_complex(mesh):
    n = 1 << 14
    n2, n1 = dist_fft_shape(n, 8)
    z = _complex_signal(n)
    p = dist_fft(jnp.asarray(z).reshape(n2, n1), mesh)
    got = permuted_to_natural_host(p)
    want = np.fft.fft(z)
    assert_snr(want.real, got.real, 200.0)
    assert_snr(want.imag, got.imag, 200.0)


def test_sharded_fir_jnp_complex(mesh):
    taps = sps.firwin(63, 0.3)
    z = _complex_signal(4096)
    out = sharded_fir_filter(jnp.asarray(z), jnp.asarray(taps), mesh)
    want = sps.lfilter(taps, 1.0, z)
    assert isinstance(out, ComplexArray)
    np.testing.assert_allclose(out.real, want.real, atol=1e-10)
    np.testing.assert_allclose(out.imag, want.imag, atol=1e-10)


# ── integer / bool / mismatched-plane inputs (round-5 hardening: the
#    same silent-wrong-answer class as the complex-dtype bug) ──


def test_fft_integer_input_matches_numpy():
    # int planes used to truncate the twiddle products: fft(arange(8))
    # returned [-4+4j, ...] instead of [-4+9.657j, ...].
    got = ops.fft(jnp.arange(8)).to_numpy_complex()
    np.testing.assert_allclose(got, np.fft.fft(np.arange(8)), atol=1e-6)


def test_as_complex_array_coerces_int_and_bool():
    ca = as_complex_array(jnp.arange(4))
    assert jnp.issubdtype(ca.dtype, jnp.floating)
    ca = as_complex_array(np.asarray([True, False]))
    assert jnp.issubdtype(ca.dtype, jnp.floating)
    ca = as_complex_array((np.arange(4), np.arange(4)))
    assert jnp.issubdtype(ca.dtype, jnp.floating)


def test_complex_array_rejects_int_planes():
    with pytest.raises(TypeError, match="non-float"):
        ComplexArray(jnp.arange(4), jnp.zeros(4))


def test_complex_array_rejects_mismatched_shapes():
    with pytest.raises(TypeError, match="shapes differ"):
        ComplexArray(jnp.zeros(4), jnp.zeros(8))


def test_real_dsp_entries_coerce_integer_input():
    """fir_filter / overlap_save / upfirdn / stft / spectrogram used to
    cast taps and windows to the INPUT dtype, so integer signals
    silently zeroed the filters (fir_filter(arange) returned all
    zeros, spectrogram amplitude read 0.0). Each entry now coerces."""
    from pragma_dsp_tpu.ops import overlap_save_filter, upfirdn
    from pragma_dsp_tpu.stream import spectrogram, stft

    x = np.arange(64)
    taps = sps.firwin(9, 0.3)
    np.testing.assert_allclose(
        np.asarray(fir_filter(jnp.asarray(x), jnp.asarray(taps))),
        sps.lfilter(taps, 1.0, x.astype(float)), atol=1e-9)
    got = np.asarray(upfirdn(jnp.asarray(x), taps, 3, 4))
    ref = sps.upfirdn(taps, x.astype(float), 3, 4)
    m = min(len(got), len(ref))
    np.testing.assert_allclose(got[:m], ref[:m], atol=1e-9)
    x2 = np.arange(2048)
    t127 = sps.firwin(127, 0.2)
    np.testing.assert_allclose(
        np.asarray(overlap_save_filter(jnp.asarray(x2),
                                       jnp.asarray(t127))),
        sps.lfilter(t127, 1.0, x2.astype(float)), atol=1e-8)
    xi = np.arange(512)
    ri = spectrogram(jnp.asarray(xi), 128, 32, "hann")
    rf = spectrogram(jnp.asarray(xi, jnp.float64), 128, 32, "hann")
    np.testing.assert_array_equal(np.asarray(ri.amplitude),
                                  np.asarray(rf.amplitude))
    si = stft(jnp.asarray(xi), 128, 32)
    sf = stft(jnp.asarray(xi, jnp.float64), 128, 32)
    np.testing.assert_array_equal(np.asarray(si.real),
                                  np.asarray(sf.real))


def test_streaming_entries_coerce_integer_input():
    from pragma_dsp_tpu.ops import fir_step, fir_stream_init, iir_one_pole

    taps = sps.firwin(9, 0.3)
    st = fir_stream_init(taps)
    st, y = fir_step(st, jnp.arange(32), taps)
    np.testing.assert_allclose(
        np.asarray(y), sps.lfilter(taps, 1.0, np.arange(32).astype(float)),
        atol=1e-9)
    a = 0.9
    np.testing.assert_allclose(
        np.asarray(iir_one_pole(jnp.arange(64), a)),
        sps.lfilter([1 - a], [1, -a], np.arange(64).astype(float)),
        atol=1e-9)


def test_complex_input_still_flows_through_real_entries():
    """Regression (round-5 review): ensure_float must NOT truncate
    complex input — iir_one_pole and stft legitimately process complex
    IQ, and the pre-guard behavior computed the true complex result."""
    from pragma_dsp_tpu.ops import iir_one_pole
    from pragma_dsp_tpu.stream import stft
    from pragma_dsp_tpu.xform.fourier import window_values

    iq = _complex_signal(256)
    a = 0.9
    y = np.asarray(iir_one_pole(jnp.asarray(iq), a))
    assert np.iscomplexobj(y)
    np.testing.assert_allclose(y, sps.lfilter([1 - a], [1, -a], iq),
                               atol=1e-9)
    s = stft(jnp.asarray(iq), 64, 16)
    z = np.asarray(s.real) + 1j * np.asarray(s.imag)
    wv = window_values("hann", 64)
    frames = np.lib.stride_tricks.sliding_window_view(iq, 64)[::16]
    np.testing.assert_allclose(z, np.fft.fft(frames * wv, axis=-1),
                               atol=1e-9)


def test_as_complex_array_tuple_complex_planes_raise():
    with pytest.raises(TypeError, match="complex dtype"):
        as_complex_array((np.array([1 + 2j]), np.array([3 + 4j])))


def test_as_complex_array_rejects_non_float_dtype_request():
    with pytest.raises(TypeError, match="must be floating"):
        as_complex_array(np.arange(4.0), dtype=jnp.int32)


def test_rfft_integer_input_matches_numpy():
    from pragma_dsp_tpu.ops import rfft

    got = rfft(jnp.arange(8))
    z = np.asarray(got.real) + 1j * np.asarray(got.imag)
    np.testing.assert_allclose(z, np.fft.rfft(np.arange(8)), atol=1e-6)
