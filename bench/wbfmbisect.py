#!/usr/bin/env python3
"""One-off probe: cumulative-composition bisect of the WBFM chain.
Per-stage times sum to ~0.2 ms but the composed chain measured ~14 ms;
this times chan, chan+disc, chan+disc+deemph, full to find where the
composed program goes off the rails."""

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
    K = 50

    rtt = timed(lambda v: (v * 1.000001,), (jnp.ones((8, 128)),), 400, "rtt")
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    acc0 = jnp.zeros((), jnp.float32)

    rx = FmReceiver(FmReceiverConfig())
    chan_taps = jnp.asarray(rx._chan_taps)
    audio_taps = jnp.asarray(rx._audio_taps)
    dec = rx._decim1
    c = rx.config

    def mk2(op):
        def step(v, w, acc):
            out = op(v, w)
            s = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(out))
            probe = v[:1] + s * jnp.asarray(1e-30, v.dtype)
            return lax.dynamic_update_slice(v, probe, (0,)), w, acc + s
        return step

    def upto_chan(v, w):
        return upfirdn(ComplexArray(v, w), chan_taps, 1, dec)

    def upto_disc(v, w):
        chan = upto_chan(v, w)
        return fm_discriminate(chan, sample_rate=c.if_rate,
                               deviation=c.deviation)

    def upto_deemph(v, w):
        return deemphasis(upto_disc(v, w), c.if_rate, c.deemphasis_tau)

    def full(v, w):
        return upfirdn(upto_deemph(v, w), audio_taps, rx._up, rx._down)

    for name, fn in [("chan", upto_chan), ("chan+disc", upto_disc),
                     ("chan+disc+deemph", upto_deemph), ("full", full)]:
        t = timed(mk2(fn), (re, im, acc0), K, name)
        print(f"{name}: {(t-rtt)/K*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
