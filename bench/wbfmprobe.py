#!/usr/bin/env python3
"""One-off probe: per-stage timing of the WBFM demod chain (config 4).
Not part of the bench suite; see bench/kernels.py for the real row."""

import time

import numpy as np

import helpers  # noqa: F401

import jax
import jax.numpy as jnp
from jax import lax

from pragma_dsp_tpu.core.complex import ComplexArray
from pragma_dsp_tpu.models.fm_receiver import FmReceiver, FmReceiverConfig
from pragma_dsp_tpu.ops.demod import deemphasis, fm_discriminate
from pragma_dsp_tpu.ops.polyphase import upfirdn


def timed(step, args, k, label=""):
    @jax.jit
    def run(*a):
        out = lax.fori_loop(0, k, lambda _, c: step(*c), a)
        return sum(jnp.sum(t.reshape(-1)[::113]) for t in
                   jax.tree_util.tree_leaves(out))
    t0 = time.time()
    float(run(*args))
    print(f"  [{label}] first {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    L = 1 << 22
    re = jnp.asarray(rng.standard_normal(L), jnp.float32)
    im = jnp.asarray(rng.standard_normal(L), jnp.float32)
    K = 100

    rtt = timed(lambda v: (v * 1.000001,), (jnp.ones((8, 128)),), 400, "rtt")
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    acc0 = jnp.zeros((), jnp.float32)

    rx = FmReceiver(FmReceiverConfig())
    chan_taps = jnp.asarray(rx._chan_taps)
    audio_taps = jnp.asarray(rx._audio_taps)
    dec = rx._decim1

    def mk2(op):
        def step(v, w, acc):
            out = op(v, w)
            s = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(out))
            probe = v[:1] + s * jnp.asarray(1e-30, v.dtype)
            return lax.dynamic_update_slice(v, probe, (0,)), w, acc + s
        return step

    def mk1(op, x0):
        def step(v, acc):
            out = op(v)
            s = jnp.sum(out)
            probe = v[:1] + s * jnp.asarray(1e-30, v.dtype)
            return lax.dynamic_update_slice(v, probe, (0,)), acc + s
        return step

    # stage 1: channel filter + decimate (2 real planes)
    t = timed(mk2(lambda v, w: upfirdn(ComplexArray(v, w), chan_taps,
                                       1, dec)), (re, im, acc0), K, "chan")
    print(f"channel upfirdn 1/{dec}: {(t-rtt)/K*1e3:.3f} ms", flush=True)

    mid = L // dec
    mre = re[:mid]
    mim = im[:mid]

    # stage 2: discriminator at if_rate
    t = timed(mk2(lambda v, w: fm_discriminate(ComplexArray(v, w),
                                               sample_rate=240e3,
                                               deviation=75e3)),
              (mre, mim, acc0), K, "disc")
    print(f"fm_discriminate {mid/1e6:.2f}M: {(t-rtt)/K*1e3:.3f} ms",
          flush=True)

    # stage 3: de-emphasis (associative scan) at if_rate
    t = timed(mk1(lambda v: deemphasis(v, 240e3), mre), (mre, acc0), K,
              "deemph")
    print(f"deemphasis {mid/1e6:.2f}M: {(t-rtt)/K*1e3:.3f} ms", flush=True)

    # stage 4: audio resample
    t = timed(mk1(lambda v: upfirdn(v, audio_taps, rx._up, rx._down), mre),
              (mre, acc0), K, "audio")
    print(f"audio upfirdn {rx._up}/{rx._down}: {(t-rtt)/K*1e3:.3f} ms",
          flush=True)

    # full chain
    t = timed(mk2(lambda v, w: rx(ComplexArray(v, w))), (re, im, acc0),
              max(K // 4, 1), "full")
    print(f"full WBFM chain: {(t-rtt)/max(K//4,1)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
