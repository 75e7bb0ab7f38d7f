"""Window-function tests vs scipy sym=True fixtures
(reference test/window.test.ts:18-27)."""

import numpy as np
import pytest

from pragma_dsp_tpu.xform import create_window
from pragma_dsp_tpu.xform.fourier import window_values
from pragma_dsp_tpu.utils.fixtures import assert_close


def test_windows_match_scipy(unit_fixtures):
    for w in unit_fixtures["windows"]:
        got = window_values(w["type"], w["n"])
        assert_close(w["values"], got, abs_tol=1e-8,
                     label=f"{w['type']} n={w['n']}")


def test_device_window_dtype():
    w = create_window("hann", 64)
    assert w.dtype == np.float32
    w64 = create_window("hann", 64, dtype=np.float64)
    assert_close(window_values("hann", 64), np.asarray(w64), abs_tol=0)


def test_size_one_returns_unity():
    for wtype in ("rect", "hann", "hamming", "blackman"):
        assert window_values(wtype, 1).tolist() == [1.0]


def test_invalid_inputs():
    with pytest.raises(ValueError):
        window_values("hann", 0)
    with pytest.raises(ValueError):
        window_values("kaiser", 8)


def test_coherent_gain_and_enbw_match_goldens(windows_dsp_refs):
    from pragma_dsp_tpu.xform import coherent_gain, enbw

    for c in windows_dsp_refs["cases"]:
        assert abs(coherent_gain(c["type"], c["n"]) - c["coherentGain"]) < 1e-12
        assert abs(enbw(c["type"], c["n"]) - c["enbw"]) < 1e-12
