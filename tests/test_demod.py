"""AM/FM demodulation vs numpy oracles (BASELINE config 4)."""

import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

from pragma_dsp_tpu.core import ComplexArray
from pragma_dsp_tpu.ops.demod import (
    am_demod, deemphasis, fm_discriminate, fm_discriminate_step,
    fm_stream_init, iir_one_pole,
)
from pragma_dsp_tpu.utils.fixtures import assert_snr, snr_db

RNG = np.random.default_rng(30)


def _fm_modulate(message, fs, deviation):
    phase = 2 * np.pi * deviation * np.cumsum(message) / fs
    return np.exp(1j * phase)


def _ca(z):
    return ComplexArray(jnp.asarray(z.real), jnp.asarray(z.imag))


def test_fm_discriminator_recovers_tone():
    fs = 192000.0
    dev = 30000.0
    t = np.arange(19200) / fs
    msg = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    iq = _fm_modulate(msg, fs, dev)
    out = np.asarray(fm_discriminate(_ca(iq), sample_rate=fs, deviation=dev))
    # First sample has no history; compare the rest to the message
    # (1-sample backward difference approximates the derivative).
    assert snr_db(msg[1:], out[1:]) > 40


def test_fm_discriminator_matches_numpy_oracle():
    fs = 100000.0
    msg = RNG.standard_normal(5000) * 0.3
    msg = sps.lfilter(sps.firwin(63, 0.1), 1.0, msg)  # bandlimit
    iq = _fm_modulate(msg, fs, 10000.0)
    ref = np.angle(iq[1:] * np.conj(iq[:-1])) * fs / (2 * np.pi)
    got = np.asarray(fm_discriminate(_ca(iq), sample_rate=fs))
    assert_snr(ref, got[1:], 100, "discriminator vs oracle")


def test_fm_streaming_matches_batch():
    fs = 48000.0
    t = np.arange(4096) / fs
    iq = _fm_modulate(np.sin(2 * np.pi * 500 * t), fs, 5000.0)
    batch = np.asarray(fm_discriminate(_ca(iq), sample_rate=fs))
    state = fm_stream_init(dtype=jnp.float64)
    outs = []
    for i in range(4):
        state, y = fm_discriminate_step(state, _ca(iq[i * 1024:(i + 1) * 1024]),
                                        sample_rate=fs)
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    np.testing.assert_allclose(got, batch, atol=1e-9)


def test_am_demod_envelope():
    fs = 48000.0
    t = np.arange(9600) / fs
    msg = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    carrier = np.exp(1j * 2 * np.pi * 10000.0 * t)
    iq = (1.0 + msg) * carrier
    env = np.asarray(am_demod(_ca(iq), remove_dc=True))
    assert snr_db(msg, env) > 60


def test_iir_one_pole_matches_lfilter():
    x = RNG.standard_normal(3000)
    alpha = 0.95
    ref = sps.lfilter([1 - alpha], [1, -alpha], x)
    got = np.asarray(iir_one_pole(jnp.asarray(x), alpha))
    assert_snr(ref, got, 110, "one-pole IIR")


def test_iir_one_pole_y0_and_traced_alpha_paths():
    """Blocked (concrete alpha) and associative-scan (traced alpha)
    paths agree with a f64 loop oracle, including a nonzero initial
    condition and batched input."""
    import jax

    x = RNG.standard_normal((2, 517))      # non-multiple of the 128 block
    alpha, y0 = 0.9, 1.5
    ref = np.empty_like(x)
    for b in range(x.shape[0]):
        acc = y0
        for n in range(x.shape[1]):
            acc = (1 - alpha) * x[b, n] + alpha * acc
            ref[b, n] = acc
    blocked = np.asarray(iir_one_pole(jnp.asarray(x), alpha, y0=y0))
    assert_snr(ref, blocked, 110, "blocked IIR with y0")

    # Traced alpha under jit takes the element associative-scan fallback.
    scanned = np.asarray(jax.jit(
        lambda v, a: iir_one_pole(v, a, y0=y0))(jnp.asarray(x),
                                                jnp.asarray(alpha)))
    assert_snr(ref, scanned, 110, "scan IIR with y0")


def test_deemphasis_is_lowpass():
    fs = 48000.0
    x = RNG.standard_normal(8192)
    y = np.asarray(deemphasis(jnp.asarray(x), fs, tau=75e-6))
    X = np.abs(np.fft.rfft(x))
    Y = np.abs(np.fft.rfft(y))
    lo = slice(1, 100)
    hi = slice(3500, 4000)
    assert (Y[hi] / X[hi]).mean() < 0.5 * (Y[lo] / X[lo]).mean()
