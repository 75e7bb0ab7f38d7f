"""Pallas kernel + four-step + dispatch tests (interpret mode on CPU),
validated against the numpy oracle and the Stockham reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from pragma_dsp_tpu.core import ComplexArray
from pragma_dsp_tpu.ops import (
    fft, fft_fourstep, fft_pallas, fft_pallas_permuted, ifft,
    ifft_fourstep, ifft_pallas, ifft_pallas_from_permuted,
    spectrum_amplitude_pallas, set_fft_impl,
)
from pragma_dsp_tpu.utils.fixtures import snr_db
from pragma_dsp_tpu.xform.fourier import window_values

pytestmark = pytest.mark.slow  # interpret-mode Pallas tier

RNG = np.random.default_rng(0)


def _cx(shape):
    z = RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)
    return z.astype(np.complex64)


def _ca(z):
    return ComplexArray(jnp.asarray(z.real), jnp.asarray(z.imag))


@pytest.mark.parametrize("n", [64, 128, 256, 1024, 4096])
def test_fourstep_matches_numpy(n):
    z = _cx((3, n))
    out = fft_fourstep(_ca(z)).to_numpy_complex()
    ref = np.fft.fft(z, axis=-1)
    assert snr_db(ref.view(np.float64).reshape(ref.shape + (2,)) if False else
                  np.stack([ref.real, ref.imag]),
                  np.stack([out.real, out.imag])) > 110


@pytest.mark.parametrize("n", [64, 128, 256, 1024, 4096])
def test_pallas_fft_matches_numpy(n):
    z = _cx((4, n))
    out = fft_pallas(_ca(z)).to_numpy_complex()
    ref = np.fft.fft(z, axis=-1)
    assert snr_db(np.stack([ref.real, ref.imag]),
                  np.stack([out.real, out.imag])) > 110


@pytest.mark.parametrize("n", [64, 1024])
def test_pallas_roundtrip(n):
    z = _cx((4, n))
    rt = ifft_pallas(fft_pallas(_ca(z))).to_numpy_complex()
    assert np.abs(rt - z).max() < 1e-4


@pytest.mark.parametrize("n", [64, 1024, 4096])
def test_permuted_roundtrip_zero_transpose(n):
    z = _cx((4, n))
    p = fft_pallas_permuted(_ca(z))
    rt = ifft_pallas_from_permuted(p, n).to_numpy_complex()
    assert np.abs(rt - z).max() < 1e-4


def test_permuted_order_definition():
    # P[.., k2, k1] must equal X[k2 + N2*k1]
    n = 1024
    n2, n1 = n // 128, 128
    z = _cx((2, n))
    p = fft_pallas_permuted(_ca(z))
    ref = np.fft.fft(z, axis=-1)
    pref = ref.reshape(2, n1, n2).transpose(0, 2, 1)  # [b, k2, k1]
    got = p.to_numpy_complex()
    assert got.shape == (2, n2, n1)
    assert snr_db(np.stack([pref.real, pref.imag]),
                  np.stack([got.real, got.imag])) > 110


def test_fourstep_inverse(n=1024):
    z = _cx((2, n))
    rt = ifft_fourstep(fft_fourstep(_ca(z))).to_numpy_complex()
    assert np.abs(rt - z).max() < 1e-4


def test_fused_spectrum_amplitude_matches_reference_scaling():
    n = 1024
    x = RNG.standard_normal((3, n)).astype(np.float32)
    for sides in ("one", "two"):
        amp = np.asarray(spectrum_amplitude_pallas(jnp.asarray(x), n,
                                                   window="hann", sides=sides))
        w = window_values("hann", n)
        mags = np.abs(np.fft.fft(x * w, axis=-1))
        if sides == "one":
            k = np.arange(n // 2 + 1)
            f = np.where((k == 0) | (k == n // 2), 1 / n, 2 / n)
            ref = mags[:, : n // 2 + 1] * f
        else:
            ref = mags / n
        assert snr_db(ref, amp) > 110


def test_fused_spectrum_xla_turn_matches_reference_scaling():
    """n = 4096 drives the turn="xla" strategy (permuted pair-packed
    kernel output + one XLA transpose epilogue, _turn_strategy): every
    bin incl. DC/Nyquist must land at its natural index with the exact
    one-sided scaling law (src/public/spectrum.ts:45-61)."""
    n = 4096
    x = RNG.standard_normal((2, n)).astype(np.float32)
    amp = np.asarray(spectrum_amplitude_pallas(jnp.asarray(x), n,
                                               window="hann", sides="one"))
    w = window_values("hann", n)
    k = np.arange(n // 2 + 1)
    f = np.where((k == 0) | (k == n // 2), 1 / n, 2 / n)
    ref = np.abs(np.fft.rfft(x.astype(np.float64) * w, axis=-1)) * f
    assert amp.shape == ref.shape
    assert snr_db(ref, amp) > 110


def test_fused_spectrum_bf16x3_precision_mode():
    # The fast split-bf16 dot mode trades ~28 dB of headroom for ~1.4x
    # throughput on v5e; it must stay above 105 dB SNR vs f64 and agree
    # with the full-precision mode on peak location.
    n = 2048
    x = RNG.standard_normal((4, n)).astype(np.float32)
    fast = np.asarray(spectrum_amplitude_pallas(
        jnp.asarray(x), n, window="hann", sides="one", precision="bf16x3"))
    w = window_values("hann", n)
    k = np.arange(n // 2 + 1)
    f = np.where((k == 0) | (k == n // 2), 1 / n, 2 / n)
    ref = np.abs(np.fft.rfft(x.astype(np.float64) * w, axis=-1)) * f
    assert snr_db(ref, fast) > 105
    full = np.asarray(spectrum_amplitude_pallas(
        jnp.asarray(x), n, window="hann", sides="one", precision="highest"))
    assert (np.argmax(fast[:, 1:], axis=1) == np.argmax(full[:, 1:], axis=1)).all()
    try:
        spectrum_amplitude_pallas(jnp.asarray(x), n, precision="bogus")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_dispatch_selects_and_overrides():
    z = _cx((2, 256))
    ref = np.fft.fft(z, axis=-1)
    for impl in ("stockham", "fourstep", "pallas"):
        out = fft(_ca(z), impl=impl).to_numpy_complex()
        assert snr_db(np.stack([ref.real, ref.imag]),
                      np.stack([out.real, out.imag])) > 110, impl
        rt = ifft(fft(_ca(z), impl=impl), impl=impl).to_numpy_complex()
        assert np.abs(rt - z).max() < 1e-4, impl
    set_fft_impl("stockham")
    try:
        out = fft(_ca(z)).to_numpy_complex()
        assert snr_db(np.stack([ref.real, ref.imag]),
                      np.stack([out.real, out.imag])) > 110
    finally:
        set_fft_impl("auto")


def test_dispatch_f64_stays_reference():
    # On CPU with x64, dispatch must keep full f64 accuracy.
    z = (RNG.standard_normal((2, 512)) + 1j * RNG.standard_normal((2, 512)))
    out = fft(ComplexArray(jnp.asarray(z.real), jnp.asarray(z.imag)))
    ref = np.fft.fft(z, axis=-1)
    assert np.abs(out.to_numpy_complex() - ref).max() < 1e-9


def test_spectrum_rejects_non_pow2():
    """ADVICE r1: the roll-DIF sublane stage needs n/128 to be a power of
    two; n=384 must raise, not silently return wrong amplitudes."""
    import pytest
    from pragma_dsp_tpu.ops.fft_pallas import spectrum_amplitude_pallas

    x = jnp.zeros((4, 384), dtype=jnp.float32)
    with pytest.raises(ValueError, match="power of two"):
        spectrum_amplitude_pallas(x, 384)


def test_fused_amp_phase_matches_pipeline():
    """spectrum_amp_phase_pallas == the plain spectrum() pipeline (which
    on CPU runs the dispatch FFT + hypot/atan2), amp and phase both."""
    from pragma_dsp_tpu.ops.fft_pallas import spectrum_amp_phase_pallas
    from pragma_dsp_tpu.public import spectrum

    rng = np.random.default_rng(21)
    n = 1024
    t = np.arange(n) / 48000.0
    x = (0.8 * np.sin(2 * np.pi * 1500.0 * t + 0.7)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)
    xb = np.stack([x, np.roll(x, 5)])
    amp, ph = spectrum_amp_phase_pallas(jnp.asarray(xb), n, "hann",
                                        interpret=True)
    ref = spectrum(jnp.asarray(xb), sample_rate=48000.0, window="hann")
    np.testing.assert_allclose(np.asarray(amp), np.asarray(ref.amplitude),
                               atol=2e-6)
    # phase only where the bin has real energy (atan2 of noise is chaos)
    mask = np.asarray(ref.amplitude) > 1e-3
    got = np.asarray(ph)[mask]
    want = np.asarray(ref.phase)[mask]
    d = np.angle(np.exp(1j * (got - want)))
    np.testing.assert_allclose(d, np.zeros_like(d), atol=1e-4)


def test_fused_amp_phase_nyquist_and_dc():
    from pragma_dsp_tpu.ops.fft_pallas import spectrum_amp_phase_pallas

    n = 256
    # +DC and alternating (Nyquist) components with known signs
    x = (0.5 + 0.25 * np.cos(np.pi * np.arange(n))).astype(np.float32)
    amp, ph = spectrum_amp_phase_pallas(jnp.asarray(x[None]), n, "rect",
                                        interpret=True)
    assert abs(float(amp[0, 0]) - 0.5) < 1e-5          # DC /N
    assert abs(float(amp[0, -1]) - 0.25) < 1e-5        # Nyquist /N
    assert abs(float(ph[0, 0])) < 1e-6                 # positive DC -> 0
    assert abs(float(ph[0, -1])) < 1e-6                # positive Nyquist -> 0
    x2 = (-0.5 - 0.25 * np.cos(np.pi * np.arange(n))).astype(np.float32)
    _, ph2 = spectrum_amp_phase_pallas(jnp.asarray(x2[None]), n, "rect",
                                       interpret=True)
    assert abs(abs(float(ph2[0, 0])) - np.pi) < 1e-6   # negative DC -> ±pi
    assert abs(abs(float(ph2[0, -1])) - np.pi) < 1e-6


def test_donated_fft_matches_undonated():
    """input_output_aliases path (streaming/chained contract) must be
    bit-identical to the copying path, both directions."""
    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.fft_pallas import (
        fft_pallas_permuted, ifft_pallas_from_permuted)

    rng = np.random.default_rng(11)
    n = 1024
    xc = ComplexArray(
        jnp.asarray(rng.standard_normal((8, n)), jnp.float32),
        jnp.asarray(rng.standard_normal((8, n)), jnp.float32))
    a = fft_pallas_permuted(xc, interpret=True, precision="highest")
    b = fft_pallas_permuted(xc, interpret=True, precision="highest",
                            donate=True)
    np.testing.assert_array_equal(np.asarray(a.real), np.asarray(b.real))
    np.testing.assert_array_equal(np.asarray(a.imag), np.asarray(b.imag))
    ia = ifft_pallas_from_permuted(a, n, interpret=True, precision="highest")
    ib = ifft_pallas_from_permuted(b, n, interpret=True, precision="highest",
                                   donate=True)
    np.testing.assert_array_equal(np.asarray(ia.real), np.asarray(ib.real))
    np.testing.assert_array_equal(np.asarray(ia.imag), np.asarray(ib.imag))


def test_precision_policy_resolution():
    """None -> global policy; 'auto' -> backend rule (highest on CPU);
    explicit strings pass through; set_fft_precision validates."""
    import pytest as _pytest

    from pragma_dsp_tpu.ops.dispatch import (
        get_fft_precision, set_fft_precision)
    from pragma_dsp_tpu.ops.fft_pallas import resolve_precision

    assert get_fft_precision() == "auto"
    assert resolve_precision(None) == "highest"     # CPU backend in tests
    assert resolve_precision("auto") == "highest"
    assert resolve_precision("bf16x3") == "bf16x3"
    assert resolve_precision("highest") == "highest"
    set_fft_precision("bf16x3")
    try:
        assert resolve_precision(None) == "bf16x3"
        assert resolve_precision("highest") == "highest"  # per-call wins
    finally:
        set_fft_precision("auto")
    with _pytest.raises(ValueError):
        set_fft_precision("f16")


def test_donated_roundtrip_chain_in_scan():
    """The donated streaming contract under lax.scan: carry fft->ifft
    roundtrips for several steps; donation must not corrupt the carry
    (this is exactly the loop shape whose hidden carry copy motivated
    input_output_aliases — see BASELINE.md measurement discipline)."""
    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.ops.fft_pallas import (
        fft_pallas_permuted, ifft_pallas_from_permuted)

    import jax

    n = 1024
    rng = np.random.default_rng(23)
    re = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)

    def step(c, _):
        p = fft_pallas_permuted(ComplexArray(c[0], c[1]), interpret=True,
                                precision="highest", donate=True)
        o = ifft_pallas_from_permuted(p, n, interpret=True,
                                      precision="highest", donate=True)
        return (o.real, o.imag), None

    (orr, oii), _ = jax.lax.scan(step, (re, im), None, length=4)
    np.testing.assert_allclose(np.asarray(orr), np.asarray(re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(oii), np.asarray(im), atol=2e-4)


# ── column (axis=-2) kernel ──


@pytest.mark.parametrize("n,m", [(256, 256), (1024, 384), (4096, 128)])
def test_cols_kernel_matches_numpy(n, m):
    from pragma_dsp_tpu.ops import fft_pallas_cols_permuted
    from pragma_dsp_tpu.ops.fft_pallas import cols_permuted_to_natural

    z = _cx((2, n, m))
    p = fft_pallas_cols_permuted(_ca(z))
    got = (np.asarray(cols_permuted_to_natural(p.real, n))
           + 1j * np.asarray(cols_permuted_to_natural(p.imag, n)))
    ref = np.fft.fft(z, axis=-2)
    assert snr_db(np.stack([ref.real, ref.imag]),
                  np.stack([got.real, got.imag])) > 110


@pytest.mark.parametrize("prec,bound", [("highest", 120), ("bf16x3", 100)])
def test_cols_kernel_precisions(prec, bound):
    from pragma_dsp_tpu.ops import (fft_pallas_cols_permuted,
                                    ifft_pallas_cols_from_permuted)

    n, m = 512, 256
    z = _cx((n, m))
    p = fft_pallas_cols_permuted(_ca(z), precision=prec)
    rt = ifft_pallas_cols_from_permuted(p, precision=prec).to_numpy_complex()
    assert snr_db(np.stack([z.real, z.imag]),
                  np.stack([rt.real, rt.imag])) > bound


def test_cols_natural_wrappers_axis_minus_2():
    """fft_pallas/ifft_pallas route axis=-2 through the column kernel
    (no moveaxis of the data) with natural order both sides."""
    n, m = 256, 192
    z = _cx((3, n, m))
    out = fft_pallas(_ca(z), axis=-2).to_numpy_complex()
    ref = np.fft.fft(z, axis=-2)
    assert snr_db(np.stack([ref.real, ref.imag]),
                  np.stack([out.real, out.imag])) > 110
    rt = ifft_pallas(_ca(out), axis=-2).to_numpy_complex()
    assert np.abs(rt - z).max() < 1e-4


def test_cols_fold_grids_match_explicit_multiply():
    """The folded inter-stage twiddle equals an explicit post-multiply
    (forward) / pre-multiply (inverse) of the permuted planes."""
    from pragma_dsp_tpu.ops import (fft_pallas_cols_permuted,
                                    ifft_pallas_cols_from_permuted)

    n, m = 256, 128
    z = _cx((n, m))
    gc = RNG.standard_normal((n, m)).astype(np.float32)
    gs = RNG.standard_normal((n, m)).astype(np.float32)
    pf = fft_pallas_cols_permuted(_ca(z), fold_grids=(gc, gs))
    pe = fft_pallas_cols_permuted(_ca(z))
    np.testing.assert_allclose(
        np.asarray(pf.real), np.asarray(pe.real) * gc
        - np.asarray(pe.imag) * gs, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pf.imag), np.asarray(pe.real) * gs
        + np.asarray(pe.imag) * gc, atol=2e-4)
    vi = ifft_pallas_cols_from_permuted(
        ComplexArray(pf.real, pf.imag), fold_grids=(gc, gs))
    pre = np.asarray(pf.real) * gc - np.asarray(pf.imag) * gs
    pim = np.asarray(pf.real) * gs + np.asarray(pf.imag) * gc
    ve = ifft_pallas_cols_from_permuted(
        ComplexArray(jnp.asarray(pre), jnp.asarray(pim)))
    np.testing.assert_allclose(np.asarray(vi.real), np.asarray(ve.real),
                               atol=2e-4)


# ── two-kernel large FFT (ops/fft_big.py) ──


@pytest.mark.parametrize("n", [1 << 16, 1 << 18])
def test_fft_big_matches_numpy(n):
    from pragma_dsp_tpu.ops import fft_big, fft_big_permuted
    from pragma_dsp_tpu.ops.fft_big import big_permuted_to_natural

    z = _cx((n,))
    ref = np.fft.fft(z)
    p = fft_big_permuted(_ca(z))
    n2b, n1b = p.real.shape[-2:]
    got = (np.asarray(big_permuted_to_natural(p.real, n2b, n1b))
           + 1j * np.asarray(big_permuted_to_natural(p.imag, n2b, n1b)))
    assert snr_db(np.stack([ref.real, ref.imag]),
                  np.stack([got.real, got.imag])) > 115
    nat = fft_big(_ca(z)).to_numpy_complex()
    np.testing.assert_allclose(nat, got, rtol=0, atol=1e-3)


@pytest.mark.parametrize("prec,bound", [("highest", 115), ("bf16x3", 100)])
def test_fft_big_roundtrip(prec, bound):
    from pragma_dsp_tpu.ops import fft_big_permuted, ifft_big_from_permuted

    n = 1 << 16
    z = _cx((2, n))
    p = fft_big_permuted(_ca(z), precision=prec)
    rt = ifft_big_from_permuted(p, precision=prec).to_numpy_complex()
    assert snr_db(np.stack([z.real, z.imag]),
                  np.stack([rt.real, rt.imag])) > bound


def test_fft_big_split_and_validation():
    from pragma_dsp_tpu.ops import big_split

    assert big_split(1 << 20) == (1024, 1024)
    assert big_split(1 << 16) == (256, 256)
    assert big_split(1 << 21) == (1024, 2048)
    with pytest.raises(ValueError):
        big_split(1 << 10)
    with pytest.raises(ValueError):
        big_split((1 << 16) + 1)


def test_dispatch_big_route():
    """ops.fft at n >= MIN_BIG_N uses the two-kernel path when pinned
    (auto keeps stockham off-TPU) and matches numpy in natural order."""
    from pragma_dsp_tpu.ops import fft, ifft

    n = 1 << 16
    z = _cx((n,))
    out = fft(_ca(z), impl="big").to_numpy_complex()
    ref = np.fft.fft(z)
    assert snr_db(np.stack([ref.real, ref.imag]),
                  np.stack([out.real, out.imag])) > 115
    rt = ifft(_ca(out), impl="big").to_numpy_complex()
    assert np.abs(rt - z).max() < 2e-3


def test_fft_big_donated_roundtrip_chain_in_scan():
    """The two-kernel large-FFT path under lax.scan with donation: the
    production streaming loop shape (same contract as the row-kernel
    scan test above) — donation through the column+row kernel chain
    must not corrupt the carry."""
    import jax

    from pragma_dsp_tpu.ops import fft_big_permuted, ifft_big_from_permuted

    n = 1 << 16
    rng = np.random.default_rng(31)
    re = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((n,)), jnp.float32)

    def step(c, _):
        p = fft_big_permuted(ComplexArray(c[0], c[1]), interpret=True,
                             precision="highest", donate=True)
        o = ifft_big_from_permuted(p, interpret=True, precision="highest",
                                   donate=True)
        return (o.real, o.imag), None

    (orr, oii), _ = jax.lax.scan(step, (re, im), None, length=3)
    np.testing.assert_allclose(np.asarray(orr), np.asarray(re), atol=3e-4)
    np.testing.assert_allclose(np.asarray(oii), np.asarray(im), atol=3e-4)


def test_big_range_caps_shared_with_dispatch():
    """big_split's validity range and dispatch's routing window share
    the MAX_COLS_N/MAX_ROWS_N constants — the largest covered size
    splits cleanly and one octave above raises (dispatch falls back to
    fourstep there instead of crashing)."""
    from pragma_dsp_tpu.ops import big_split
    from pragma_dsp_tpu.ops.fft_pallas import MAX_COLS_N, MAX_ROWS_N

    n2, n1 = big_split(MAX_COLS_N * MAX_ROWS_N)
    assert n2 == MAX_COLS_N and n1 == MAX_ROWS_N
    with pytest.raises(ValueError):
        big_split(MAX_COLS_N * MAX_ROWS_N * 2)


@pytest.mark.parametrize("with_phase", [False, True])
def test_turn_strategies_agree(with_phase):
    """Both corner-turn strategies (in-kernel MXU one-hot scatter and
    permuted pair-packed emission + XLA restore) produce the same
    natural-order product — the policy (_turn_strategy) is a pure
    performance choice."""
    from pragma_dsp_tpu.ops.fft_pallas import _spectrum_amp_onesided

    n = 1024
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((16, n)), jnp.float32)
    outs = {}
    for turn in ("kernel", "xla"):
        outs[turn] = _spectrum_amp_onesided(x, n, "hann", True, "highest",
                                            with_phase, turn)
    if with_phase:
        np.testing.assert_allclose(np.asarray(outs["kernel"][0]),
                                   np.asarray(outs["xla"][0]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(outs["kernel"][1]),
                                   np.asarray(outs["xla"][1]), atol=2e-5)
    else:
        np.testing.assert_allclose(np.asarray(outs["kernel"]),
                                   np.asarray(outs["xla"]), atol=2e-6)


def test_cols_wrappers_reject_bad_sizes():
    from pragma_dsp_tpu.ops import (fft_pallas_cols_permuted,
                                    ifft_pallas_cols_from_permuted)

    z = _cx((128, 64))
    with pytest.raises(ValueError, match="power of two"):
        fft_pallas_cols_permuted(_ca(z))        # n = 128 too small
    z2 = _cx((384, 64))
    with pytest.raises(ValueError, match="power of two"):
        ifft_pallas_cols_from_permuted(_ca(z2))  # non-pow2 n
