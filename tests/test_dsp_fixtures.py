"""Committed DSP-chain goldens (scripts/gen_dsp_refs.py) validated
through the framework ops — the hermetic fixture path for configs 3-5
(the scipy-at-test-time oracles in test_fir/test_resampler/... cover the
same ops with broader parameter sweeps)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu.core import ComplexArray
from pragma_dsp_tpu.ops import fir_filter, fm_discriminate, pfb_channelize, upfirdn
from pragma_dsp_tpu.utils.fixtures import assert_snr, fixtures_dir, load_json


def _load(name):
    return load_json(os.path.join(fixtures_dir(), "dsp", f"{name}.json"))


@pytest.mark.slow
def test_fir_goldens():
    for c in _load("fir")["cases"]:
        y = fir_filter(jnp.asarray(c["input"], jnp.float64),
                       jnp.asarray(c["taps"], jnp.float64))
        assert_snr(c["output"], np.asarray(y), 130, c["name"])


def test_resampler_goldens():
    for c in _load("resampler")["cases"]:
        y = upfirdn(jnp.asarray(c["input"], jnp.float64),
                    jnp.asarray(c["taps"], jnp.float64), c["up"], c["down"])
        got = np.asarray(y)
        assert got.shape[0] == len(c["output"]), c["name"]
        assert_snr(c["output"], got, 130, c["name"])


def test_fm_demod_golden():
    c = _load("fm_demod")["cases"][0]
    iq = ComplexArray(jnp.asarray(c["iqRe"], jnp.float64),
                      jnp.asarray(c["iqIm"], jnp.float64))
    disc = fm_discriminate(iq, sample_rate=c["sampleRate"],
                           deviation=c["deviation"])
    assert_snr(c["discriminator"], np.asarray(disc)[1:], 130, c["name"])
    # ...and the discriminator output approximates the message
    assert_snr(c["message"][1:], np.asarray(disc)[1:], 35, "msg recovery")


def test_channelizer_goldens():
    for c in _load("channelizer")["cases"]:
        iq = ComplexArray(jnp.asarray(c["inputRe"], jnp.float64),
                          jnp.asarray(c["inputIm"], jnp.float64))
        y = pfb_channelize(iq, c["channels"], jnp.asarray(c["taps"]),
                           c["tapsPerBranch"])
        assert_snr(np.asarray(c["outputRe"]), np.asarray(y.real), 120,
                   c["name"] + " re")
        assert_snr(np.asarray(c["outputIm"]), np.asarray(y.imag), 120,
                   c["name"] + " im")
