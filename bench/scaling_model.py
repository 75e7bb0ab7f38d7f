#!/usr/bin/env python3
"""Analytic multi-host weak-scaling model (machine-writes BASELINE.md).

No multi-chip hardware is attached to this rig, so the >=90% north-star
clause cannot be measured here; this script produces the only evidence
this environment can: a comm-volume model per sharded pipeline — halo /
corner-turn bytes per chip against measured per-chip compute throughput
and book interconnect bandwidths — predicting weak-scaling efficiency
at 8 chips (ICI) and 2 hosts x 4 chips (DCN boundary leg).

Inputs: the measured per-chip throughputs are PARSED from the
machine-written kernel table in BASELINE.md (bench/kernels.py), so the
model updates whenever the table is re-captured. Interconnect numbers
are book values (assumptions stated in the emitted section).

Run: python bench/scaling_model.py [--write-baseline]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

BASELINE = os.path.join(_REPO, "BASELINE.md")
MARK_BEGIN = "<!-- SCALING-MODEL BEGIN (machine-written by bench/scaling_model.py) -->"
MARK_END = "<!-- SCALING-MODEL END -->"

# ── hardware assumptions (v5e, book values) ──
ICI_LINK = 4.5e10          # B/s one-way per ICI link (v5e: 4 links/chip)
ICI_LINKS = 4
ICI_LAT = 2e-6             # per-collective latency on ICI (~us scale)
A2A_AVG_HOPS = 12 / 7      # 2x4 torus: mean hop distance over 7 peers
DCN_BW = 2.5e10            # B/s per host (2x100GbE-class NICs)
DCN_LAT = 10e-6
CHIPS = 8                  # model point: 8 chips = 2x4 torus
HOSTS = 2                  # DCN leg: 2 hosts x 4 chips

# effective per-chip all_to_all bandwidth: all links driven, divided by
# the mean hop distance (each byte occupies avg_hops link-seconds)
A2A_BW = ICI_LINKS * ICI_LINK / A2A_AVG_HOPS
PPERM_BW = ICI_LINK        # neighbour shift drives one link


def parse_kernel_table():
    """Measured per-chip MS/s by row name from BASELINE.md's table."""
    text = open(BASELINE).read()
    rows = {}
    for m in re.finditer(r"\| ([^|]+?) \| ([\d.]+) ms \| ([\d,]+) MS/s",
                         text):
        rows[m.group(1).strip()] = float(m.group(3).replace(",", ""))
    return rows


def fmt_us(t):
    return f"{t*1e6:.1f} us"


def measure_chunk_overhead():
    """Single-chip overhead of corner-turn chunking (round-4 VERDICT
    #6): on a 1-device mesh the all_to_all is degenerate, so the
    chunks-C dist_fft time minus the chunks-1 time is PURE compute-side
    chunking cost (slices + separate second-stage FFTs + concat). Runs
    a 1M-point transform at chunks in {1, 2, 4, 8} on the attached
    backend (meaningful on TPU) and returns {chunks: seconds/iter}."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from pragma_dsp_tpu.core.complex import ComplexArray
    from pragma_dsp_tpu.parallel import data_mesh, dist_fft, dist_fft_shape

    mesh = data_mesh(1)
    n = 1 << 20
    n2, n1 = dist_fft_shape(n, 1)
    rng = np.random.default_rng(0)
    zr = jnp.asarray(rng.standard_normal((n2, n1)), jnp.float32)
    zi = jnp.asarray(rng.standard_normal((n2, n1)), jnp.float32)
    k = 400 if jax.default_backend() == "tpu" else 2

    def timed(c):
        def step(r, i):
            o = dist_fft(ComplexArray(r, i), mesh, chunks=c)
            return o.real, o.imag

        @jax.jit
        def run(r, i):
            out = lax.fori_loop(0, k, lambda _, s: step(*s), (r, i))
            return jnp.sum(out[0][::113]) + jnp.sum(out[1][::113])
        float(run(zr, zi))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(zr, zi))
            best = min(best, time.perf_counter() - t0)
        return best / k

    # subtract the dispatch RTT via an empty-ish loop
    tiny = jnp.ones((8, 128))

    @jax.jit
    def rttf(v):
        return jnp.sum(lax.fori_loop(0, 400, lambda _, c: c * 1.000001,
                                     v))
    float(rttf(tiny))
    import time as _t
    rtt = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        float(rttf(tiny))
        rtt = min(rtt, _t.perf_counter() - t0)

    out = {}
    for c in (1, 2, 4, 8):
        out[c] = timed(c) - rtt / k
        print(f"  1-dev 1M-pt dist_fft chunks={c}: {out[c]*1e6:.1f} us",
              file=sys.stderr)
    return out


def model(overhead_curve=None):
    t = parse_kernel_table()

    def thr(key):
        for name, v in t.items():
            if key in name:
                return v * 1e6  # samples/s
        raise KeyError(f"kernel-table row matching {key!r} not found; "
                       "re-run bench/kernels.py --write-baseline first")

    L = 4_200_000          # per-chip block (weak scaling: load/chip fixed)
    rows = []

    def add(name, rate, collective, bytes_chip, bw, lat, recompute_frac=0.0,
            note=""):
        t_c = L / rate
        t_m = bytes_chip / bw + lat
        t_r = t_c * recompute_frac
        eff_no = t_c / (t_c + t_m + t_r)
        eff_ov = t_c / (max(t_c, t_m) + t_r)   # comm overlapped w/ compute
        rows.append((name, t_c, collective, bytes_chip, t_m,
                     eff_no, eff_ov, note))
        return t_c, t_m

    # FIR halo: K-1 = 126 f32 samples to one neighbour per block.
    add("overlap-save FIR127 (halo)", thr("overlap-save FIR127"),
        "ppermute", 126 * 4, PPERM_BW, ICI_LAT)
    # Spectrogram halo: n_fft - hop = 3072 f32 samples.
    add("spectrogram 4096/75% (halo)", thr("spectrogram 4096"),
        "ppermute", 3072 * 4, PPERM_BW, ICI_LAT)
    # WBFM warm-up halo: 8200 complex IQ + recompute of the halo region.
    add("WBFM chain (warm-up halo)", thr("WBFM demod chain"),
        "ppermute", 8200 * 8, PPERM_BW, ICI_LAT,
        recompute_frac=8200 / L)
    # Time-sharded resampler halo: quantum-aligned history =
    # roundup(ceil((K-1)/up)/ (down/g)) * (down/g) input samples
    # (ops.polyphase._upfirdn_history; 1177 taps at 147/160 -> 160).
    add("resampler 147/160 (halo)", thr("resample 48k->44.1k"),
        "ppermute", 160 * 4, PPERM_BW, ICI_LAT)
    # PFB corner turn: (D-1)/D of the complex output crosses the a2a.
    add("PFB 256ch (corner turn)", thr("PFB 256ch"),
        "all_to_all", int(8 * L * (CHIPS - 1) / CHIPS), A2A_BW, ICI_LAT,
        note="comm-bound; see line-rate note")
    # dist_fft corner turn: the whole array crosses once ((D-1)/D of it).
    fft_rate = thr("pallas fft permuted 1024 bf16x3")
    t_c = L / fft_rate * 2          # two local FFT stages per sample
    t_m = 8 * L * (CHIPS - 1) / CHIPS / A2A_BW + ICI_LAT
    t_f2 = L / fft_rate             # second-stage FFT time (overlap win)
    eff_no = t_c / (t_c + t_m)
    eff_ov = t_c / (t_c + max(t_m - t_f2, 0.0))
    rows.append(("dist_fft 8M-pt (corner turn)", t_c, "all_to_all",
                 int(8 * L * (CHIPS - 1) / CHIPS), t_m, eff_no, eff_ov,
                 "chunked overlap hides min(t_comm, t_fft2)"))

    # DCN (2-host) legs: the one host-boundary hop of each halo ring,
    # and the host-crossing half of the PFB corner turn.
    dcn = []
    for name, key, bytes_hop, rfrac in (
            ("overlap-save FIR127", "overlap-save FIR127", 126 * 4, 0.0),
            ("spectrogram 4096/75%", "spectrogram 4096", 3072 * 4, 0.0),
            ("WBFM chain", "WBFM demod chain", 8200 * 8, 8200 / L)):
        rate = thr(key)
        t_c = L / rate
        t_m = bytes_hop / DCN_BW + DCN_LAT
        t_r = t_c * rfrac
        dcn.append((name, t_c, bytes_hop, t_m,
                    t_c / (t_c + t_m + t_r), t_c / (max(t_c, t_m) + t_r)))
    # No-turn config-5 consumer (sharded_channel_power): frames stay
    # sharded; the ONLY collective is a psum of the [n_fft, C] power
    # accumulator — 128*256 f32 = 131 KB, independent of stream length.
    rate = thr("PFB 256ch")
    t_c = L / rate                     # PFB dominates; periodogram ~free
    pw_bytes = 128 * 256 * 4
    t_m = pw_bytes / A2A_BW + ICI_LAT
    rows.append(("PFB + channel power (no turn)", t_c, "psum",
                 pw_bytes, t_m, t_c / (t_c + t_m), t_c / max(t_c, t_m),
                 "frames-sharded consumer, VERDICT r4 #5"))

    # PFB: each host sends the half of its output owned by the other
    # host: 4 chips x L x 8 B x 1/2 per host over DCN.
    rate = thr("PFB 256ch")
    t_c = 4 * L / rate              # host compute (4 chips in parallel /4)
    pfb_dcn_bytes = int(4 * L * 8 / 2)
    t_m = pfb_dcn_bytes / DCN_BW + DCN_LAT
    dcn.append(("PFB 256ch corner turn", t_c, pfb_dcn_bytes, t_m,
                t_c / (t_c + t_m), t_c / max(t_c, t_m)))
    # No-turn consumer over DCN: the psum crosses the host boundary
    # once; 131 KB against 25 GB/s + latency is negligible.
    t_m = pw_bytes / DCN_BW + DCN_LAT
    dcn.append(("PFB + channel power (no turn)", t_c, pw_bytes, t_m,
                t_c / (t_c + t_m), t_c / max(t_c, t_m)))

    # ── corner-turn overlap depth (round-4 VERDICT #6): the depth the
    # shipped _auto_chunks picks, from the same optimal_chunks model
    # dist_fft consumes, with the measured 1-device overhead curve. ──
    from pragma_dsp_tpu.parallel import optimal_chunks
    from pragma_dsp_tpu.parallel.dist_fft import (_CHUNK_OVERHEAD_S,
                                                  dist_fft_shape)
    if overhead_curve:
        incr = [(overhead_curve[c] - overhead_curve[1]) / (c - 1)
                for c in (2, 4, 8) if c in overhead_curve]
        o_meas = max(1e-7, sum(incr) / len(incr))
        o_note = ("measured this capture: chunks 1/2/4/8 = "
                  + "/".join(f"{overhead_curve[c]*1e6:.1f}"
                             for c in sorted(overhead_curve))
                  + f" us -> o ~= {o_meas*1e6:.1f} us/chunk")
    else:
        o_meas = _CHUNK_OVERHEAD_S
        o_note = (f"recorded constant o = {o_meas*1e6:.1f} us/chunk "
                  "(v5e 1-device 1M-pt curve, r5 capture: chunks "
                  "1/2/4/8 = 67.6/72.1/72.8/69.4 us; re-measure with "
                  "--measure-overhead)")
    depth_rows = []
    fr = thr("pallas fft permuted 1024 bf16x3")
    for npts in (1 << 20, 1 << 23, 1 << 26):
        dn2, dn1 = dist_fft_shape(npts, CHIPS)
        local = npts // CHIPS
        for link, bw in (("ICI", A2A_BW), ("DCN", DCN_BW)):
            t_comm = 8.0 * local * (CHIPS - 1) / CHIPS / bw
            t_fft2 = local / fr
            cstar = optimal_chunks(dn2, dn1, CHIPS, a2a_bw=bw,
                                   fft_rate=fr, overhead_s=o_meas)
            tot = (t_fft2 + max(t_comm, t_fft2)
                   + min(t_comm, t_fft2) / cstar + cstar * o_meas)
            eff = 2 * t_fft2 / tot
            depth_rows.append((npts, link, t_comm, t_fft2, cstar, eff))

    lines = [
        MARK_BEGIN,
        "",
        "## Predicted multi-host scaling (analytic; no pod attached)",
        "",
        "Machine-written by `bench/scaling_model.py` from the measured",
        "per-chip throughputs in the kernel table above. Assumptions:",
        f"v5e ICI {ICI_LINK/1e9:.0f} GB/s one-way per link x {ICI_LINKS} "
        f"links/chip, all_to_all effective per-chip bandwidth "
        f"{A2A_BW/1e9:.0f} GB/s ({ICI_LINKS} links / {A2A_AVG_HOPS:.2f} "
        "mean hops on a 2x4 torus), collective latency "
        f"{ICI_LAT*1e6:.0f} us; DCN {DCN_BW/1e9:.0f} GB/s per host, "
        f"{DCN_LAT*1e6:.0f} us. Per-chip block: {L/1e6:.1f} M samples "
        "(weak scaling: load per chip fixed). 'ovl' assumes the "
        "collective overlaps the previous/next block's compute "
        "(double-buffered streaming; dist_fft's chunked turn overlaps "
        "in-block).",
        "",
        f"### {CHIPS} chips, 1 host (all collectives on ICI)",
        "",
        "| Pipeline | t_compute/chip | Collective | Bytes/chip | t_comm |"
        " eff (serial) | eff (ovl) |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, t_c, coll, b, t_m, e0, e1, note in rows:
        lines.append(
            f"| {name} | {fmt_us(t_c)} | {coll} | "
            f"{b/1e3:,.1f} KB | {fmt_us(t_m)} | {100*e0:.0f}% | "
            f"{100*e1:.0f}% |")
    lines += [
        "",
        f"### {HOSTS} hosts x {CHIPS//HOSTS} chips (host-boundary leg "
        "over DCN)",
        "",
        "Halo rings are host-major: (chips-1)/chips of the hops stay on "
        "ICI and ONE hop per ring crosses DCN — the rows below model "
        "that boundary hop (the binding link). The PFB corner turn "
        "spans the joint axis, so half of each host's output crosses "
        "DCN.",
        "",
        "| Pipeline | t_compute | DCN bytes/host | t_comm | eff (serial)"
        " | eff (ovl) |",
        "|---|---|---|---|---|---|",
    ]
    for name, t_c, b, t_m, e0, e1 in dcn:
        lines.append(
            f"| {name} | {fmt_us(t_c)} | {b/1e3:,.1f} KB | {fmt_us(t_m)} "
            f"| {100*e0:.0f}% | {100*e1:.0f}% |")
    lines += [
        "",
        "### Corner-turn overlap depth (dist_fft `chunks=None` policy)",
        "",
        "`parallel.optimal_chunks` minimises max(t_comm, t_fft2) + "
        "min/C + C*o over the overlap depth C (o = per-chunk "
        "compute-side cost from the 1-device curve below); dist_fft's "
        "auto policy IS this table. " + o_note + ".",
        "",
        "| N | link | t_comm | t_fft2 | auto depth | eff (ovl) |",
        "|---|---|---|---|---|---|",
    ]
    for npts, link, t_comm, t_fft2, cstar, eff in depth_rows:
        lines.append(
            f"| {npts >> 20}M | {link} | {fmt_us(t_comm)} | "
            f"{fmt_us(t_fft2)} | {cstar} | {100*eff:.0f}% |")

    pfb_line_rate = 100e6 * 8 / 2 / DCN_BW
    lines += [
        "",
        "Reading: every halo-exchange pipeline (FIR, spectrogram, WBFM) "
        "predicts >=90% weak-scaling efficiency on both legs even "
        "WITHOUT overlap — halo bytes are 3-6 orders below block bytes, "
        "so the clause is latency-, not bandwidth-, limited, and "
        "double-buffered streaming takes them to ~100%. The two "
        "all_to_all pipelines are the honest exceptions: at full "
        "per-chip throughput the corner turn moves ~8 B/sample and "
        "binds on the interconnect (PFB ~"
        f"{100*next(r[6] for r in rows if r[0].startswith('PFB 256ch (')):.0f}% ovl on ICI; cross-host PFB is "
        "DCN-bound at full rate). Two mitigations are already in the "
        "design: (a) config 5's REAL-TIME line rate is 100 Msps — at "
        "that rate the cross-host corner turn consumes "
        f"{100*pfb_line_rate:.1f}% of one host's DCN bandwidth, so the "
        "deployed config is comfortably network-feasible; (b) layouts "
        "that keep the fat collective off DCN exist for both: "
        "`channels_sharded_out=False` (frames stay sharded, no turn) "
        "and `dist_fft(..., axis='chip', batch_axis='host')` "
        "(dp-over-host: every all_to_all rides ICI).",
        "",
        MARK_END,
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write-baseline", action="store_true")
    ap.add_argument("--measure-overhead", action="store_true",
                    help="run the 1-device chunk-overhead curve on the "
                         "attached backend (TPU) and fold it into the "
                         "depth table")
    args = ap.parse_args()
    curve = measure_chunk_overhead() if args.measure_overhead else None
    section = model(curve)
    print(section)
    if args.write_baseline:
        text = open(BASELINE).read()
        if MARK_BEGIN in text:
            pre = text[:text.index(MARK_BEGIN)]
            post = text[text.index(MARK_END) + len(MARK_END):]
            text = pre + section + post
        else:
            text = text.rstrip() + "\n\n" + section + "\n"
        open(BASELINE, "w").write(text)
        print(f"\n[written to {BASELINE}]", file=sys.stderr)


if __name__ == "__main__":
    main()
