import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import importlib
fp = importlib.import_module("pragma_dsp_tpu.ops.fft_pallas")

n, batch, k = 1024, 16384, 60
rng = np.random.default_rng(1337)
x = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
DEF = jax.lax.Precision.DEFAULT

def timed(step, arg, iters=k):
    @jax.jit
    def run(v):
        out = lax.fori_loop(0, iters, lambda _, c: step(c), v)
        return jnp.sum(out[::37, 0])
    float(run(arg))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(arg))
        best = min(best, time.perf_counter() - t0)
    return best

tiny = jnp.ones((8, 128))
rtt = timed(lambda v: v * 1.000001, tiny, 400)
print(f"RTT {rtt*1e3:.2f} ms", flush=True)
def report(name, total):
    per = (total - rtt) / k
    print(f"{name:40s} {per*1e3:8.3f} ms  {batch*n/per/1e6:8.0f} Ms/s", flush=True)

def step(v):
    amp = fp._spectrum_amp_onesided(v, n, "hann", False)
    return lax.dynamic_update_slice(v, v[:1, :1] + amp[:1, :1] * 1e-30, (0, 0))

def dg_x3(dims):
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            precision=DEF, preferred_element_type=jnp.float32)
    def f(a, b):
        ah = a.astype(jnp.bfloat16); al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16); bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))
    return f

orig_dg, orig_pick = fp._dg, fp._pick_tile
for prec_name, dg in (("HIGHEST", orig_dg), ("bf16x3", dg_x3)):
    for tb in (256, 512):
        fp._dg = dg
        fp._pick_tile = lambda b, nn, plane_budget=0, _tb=tb: _tb
        fp._spectrum_amp_onesided.clear_cache()
        report(f"{prec_name} tb={tb}", timed(step, x))
fp._dg, fp._pick_tile = orig_dg, orig_pick
