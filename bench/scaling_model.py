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


def model():
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
    # PFB: each host sends the half of its output owned by the other
    # host: 4 chips x L x 8 B x 1/2 per host over DCN.
    rate = thr("PFB 256ch")
    t_c = 4 * L / rate              # host compute (4 chips in parallel /4)
    pfb_dcn_bytes = int(4 * L * 8 / 2)
    t_m = pfb_dcn_bytes / DCN_BW + DCN_LAT
    dcn.append(("PFB 256ch corner turn", t_c, pfb_dcn_bytes, t_m,
                t_c / (t_c + t_m), t_c / max(t_c, t_m)))

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
        f"{100*rows[3][6]:.0f}% ovl on ICI; cross-host PFB is "
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
    args = ap.parse_args()
    section = model()
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
