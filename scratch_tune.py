"""Tune: tb sweep + manual bf16x3 lane dots for the one-sided kernel."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib
fp = importlib.import_module("pragma_dsp_tpu.ops.fft_pallas")
from pragma_dsp_tpu.xform.fourier import window_values

n, batch, k = 1024, 16384, 60
rng = np.random.default_rng(1337)
t = np.arange(n) / 48000.0
base = 0.8 * np.sin(2 * np.pi * 1500.0 * t)
xnp = (np.tile(base, (batch, 1)) + 0.01 * rng.standard_normal((batch, n))).astype(np.float32)
x = jnp.asarray(xnp)

def timed(step, arg, iters=k):
    @jax.jit
    def run(v):
        out = lax.fori_loop(0, iters, lambda _, c: step(c), v)
        return jnp.sum(out[::37, 0])
    float(run(arg))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(arg))
        best = min(best, time.perf_counter() - t0)
    return best

tiny = jnp.ones((8, 128))
rtt = timed(lambda v: v * 1.000001, tiny, 400)
print(f"RTT {rtt*1e3:.2f} ms", flush=True)
def report(name, total):
    per = (total - rtt) / k
    print(f"{name:50s} {per*1e3:8.3f} ms  {batch*n/per/1e6:8.0f} Ms/s", flush=True)

orig_pick = fp._pick_tile
def step(v):
    amp = fp._spectrum_amp_onesided(v, n, "hann", False)
    return lax.dynamic_update_slice(v, v[:1, :1] + amp[:1, :1] * 1e-30, (0, 0))

for tb in (128, 256, 512):
    fp._pick_tile = lambda b, nn, plane_budget=0, _tb=tb: _tb
    fp._spectrum_amp_onesided.clear_cache()
    try:
        report(f"one-sided tb={tb}", timed(step, x))
    except Exception as e:
        print(f"tb={tb} FAIL: {str(e)[:90]}", flush=True)
fp._pick_tile = orig_pick
fp._spectrum_amp_onesided.clear_cache()

# bf16x3 variant: patch _dg to a 3-dot split for the lane contraction
HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT

def split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo

def dg_x3(dims):
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            precision=DEF, preferred_element_type=jnp.float32)
    def f(a, b):
        ah, al = split_bf16(a)
        bh, bl = split_bf16(b)
        return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))
    return f

orig_dg = fp._dg
fp._dg = dg_x3
fp._spectrum_amp_onesided.clear_cache()
try:
    report("one-sided bf16x3 dots", timed(step, x))
    got = np.asarray(fp._spectrum_amp_onesided(x[:64], n, "hann", False))
    w = window_values("hann", n)
    ref = np.abs(np.fft.rfft(xnp[:64].astype(np.float64) * w, axis=1))
    sc = np.ones(513) * 2.0 / n; sc[0] = 1.0 / n; sc[-1] = 1.0 / n
    ref *= sc
    snr = 10 * np.log10((ref ** 2).sum() / max(((got - ref) ** 2).sum(), 1e-300))
    print(f"bf16x3 accuracy: max|err| {np.abs(got-ref).max():.3e}  SNR {snr:.1f} dB", flush=True)
except Exception as e:
    print("bf16x3 FAIL:", str(e)[:120], flush=True)
fp._dg = orig_dg
fp._spectrum_amp_onesided.clear_cache()

# ---- manual bf16x6 (full f32-equivalent) ----
def split3(a):
    a0 = a.astype(jnp.bfloat16)
    r = a - a0.astype(jnp.float32)
    a1 = r.astype(jnp.bfloat16)
    a2 = (r - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    return a0, a1, a2

def dg_x6(dims):
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            precision=DEF, preferred_element_type=jnp.float32)
    def f(a, b):
        a0, a1, a2 = split3(a)
        b0, b1, b2 = split3(b)
        # smallest terms first
        return ((dot(a0, b2) + dot(a2, b0)) + (dot(a1, b1) + dot(a0, b1) + dot(a1, b0))) + dot(a0, b0)
    return f

fp._dg = dg_x6
fp._spectrum_amp_onesided.clear_cache()
try:
    report("one-sided bf16x6 dots", timed(step, x))
    got = np.asarray(fp._spectrum_amp_onesided(x[:64], n, "hann", False))
    w = window_values("hann", n)
    ref = np.abs(np.fft.rfft(xnp[:64].astype(np.float64) * w, axis=1))
    sc = np.ones(513) * 2.0 / n; sc[0] = 1.0 / n; sc[-1] = 1.0 / n
    ref *= sc
    snr = 10 * np.log10((ref ** 2).sum() / max(((got - ref) ** 2).sum(), 1e-300))
    print(f"bf16x6 accuracy: max|err| {np.abs(got-ref).max():.3e}  SNR {snr:.1f} dB", flush=True)
except Exception as e:
    print("bf16x6 FAIL:", str(e)[:120], flush=True)
fp._dg = orig_dg
fp._spectrum_amp_onesided.clear_cache()
