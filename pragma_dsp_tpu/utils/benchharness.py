"""Roofline bench harness with checksum guardrails.

Carries over the reference's BenchContext philosophy (bench/reallife/
helpers.ts:152-338): warmup + timed iterations, min/avg/max, and a
checksum accumulated from every result so runs are deterministic and
dead-code-elimination-proof ("guardrails, not bragging", reference
PLAN.md:169-184). Adds TPU-specific accounting: HBM bytes and FLOPs per
call so every measurement reports a roofline fraction.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

__all__ = ["BenchResult", "BenchContext", "checksum", "device_specs",
           "memory_snapshot"]

# Peak specs per TPU generation for roofline accounting.
# (HBM GB/s, f32 matmul TFLOP/s, bf16 matmul TFLOP/s)
_DEVICE_SPECS = {
    "v5e": (819.0e9, 49.2e12, 197.0e12),
    "v5 lite": (819.0e9, 49.2e12, 197.0e12),
    "v4": (1228.0e9, 137.5e12 / 2, 275.0e12),
    "v5p": (2765.0e9, 229.5e12 / 2, 459.0e12),
    "v6e": (1640.0e9, 91.5e12, 918.0e12 / 2),
    "cpu": (50.0e9, 0.5e12, 0.5e12),
}


def device_specs() -> Dict[str, float]:
    kind = jax.devices()[0].device_kind.lower()
    for key, (bw, f32, bf16) in _DEVICE_SPECS.items():
        if key in kind:
            return {"hbm_bytes_per_s": bw, "f32_flops": f32, "bf16_flops": bf16,
                    "vpu_flops": _vpu_peak(bf16), "kind": kind}
    return {"hbm_bytes_per_s": _DEVICE_SPECS["cpu"][0],
            "f32_flops": _DEVICE_SPECS["cpu"][1],
            "bf16_flops": _DEVICE_SPECS["cpu"][2],
            "vpu_flops": _vpu_peak(_DEVICE_SPECS["cpu"][2]), "kind": kind}


def _vpu_peak(bf16_flops: float) -> float:
    """Modeled VPU peak (elementwise f32 ops/s): 4 ALUs x (8, 128) = 1024
    vector lanes per cycle, clock inferred from the MXU bf16 peak
    (bf16_flops / (4 MXUs x 128x128 MACs x 2 flops)). Algebraically
    that is bf16_flops / 32 — e.g. v5e: 197 TF/s -> ~6.2 T elementwise
    op/s. A modeled convention (like the HBM%% accounting), used to name
    which engine binds a kernel row, not a vendor spec."""
    return bf16_flops / 32.0


def memory_snapshot() -> Dict[str, int]:
    """Device + host memory snapshot (reference BenchContext.memory,
    bench/reallife/helpers.ts:249-265: heap/RSS before+after each
    section — here HBM live/peak via the PJRT allocator plus host RSS).

    Returns zeros for fields a backend doesn't report (CPU has no
    memory_stats; RSS falls back to /proc/self/status)."""
    out = {"hbm_in_use_bytes": 0, "hbm_peak_bytes": 0, "host_rss_bytes": 0}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        out["hbm_in_use_bytes"] = int(stats.get("bytes_in_use", 0))
        out["hbm_peak_bytes"] = int(stats.get("peak_bytes_in_use", 0))
    except Exception:
        pass
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    out["host_rss_bytes"] = int(line.split()[1]) * 1024
                    break
    except OSError:
        pass
    return out


def checksum(*arrays) -> float:
    """Order-stable scalar digest of result arrays (DCE guard + regression
    guardrail, cf. reference bench/run.ts:18-35)."""
    total = 0.0
    for a in arrays:
        x = np.asarray(a, dtype=np.float64).ravel()
        if x.size == 0:
            continue
        w = np.arange(1, x.size + 1, dtype=np.float64)
        total += float(np.sum(x * np.cos(w * 1e-3))) % 1e6
    return total


@dataclass
class BenchResult:
    name: str
    iters: int
    min_s: float
    avg_s: float
    max_s: float
    samples_per_call: Optional[int] = None
    hbm_bytes_per_call: Optional[int] = None
    flops_per_call: Optional[int] = None
    checksum: float = 0.0
    mem_before: Optional[Dict[str, int]] = None
    mem_after: Optional[Dict[str, int]] = None

    @property
    def hbm_growth_bytes(self) -> Optional[int]:
        """Live-HBM delta across the timed section — ~0 for a
        steady-state streaming loop with a donated carry."""
        if self.mem_before is None or self.mem_after is None:
            return None
        return (self.mem_after["hbm_in_use_bytes"]
                - self.mem_before["hbm_in_use_bytes"])

    @property
    def msamples_per_s(self) -> Optional[float]:
        if self.samples_per_call is None:
            return None
        return self.samples_per_call / self.min_s / 1e6

    def roofline(self, specs: Dict[str, float]) -> Dict[str, float]:
        out = {}
        if self.hbm_bytes_per_call:
            out["hbm_fraction"] = (self.hbm_bytes_per_call / self.min_s
                                   / specs["hbm_bytes_per_s"])
        if self.flops_per_call:
            out["mxu_fraction_f32"] = (self.flops_per_call / self.min_s
                                       / specs["f32_flops"])
        return out


class BenchContext:
    """Timed sections with jax.block_until_ready discipline."""

    def __init__(self, warmup: int = 3, iters: int = 20):
        self.warmup = warmup
        self.iters = iters
        self.results: List[BenchResult] = []

    def time(self, name: str, fn: Callable[[], Any], *,
             samples_per_call: Optional[int] = None,
             hbm_bytes_per_call: Optional[int] = None,
             flops_per_call: Optional[int] = None,
             warmup: Optional[int] = None,
             iters: Optional[int] = None) -> BenchResult:
        warmup = self.warmup if warmup is None else warmup
        iters = self.iters if iters is None else iters
        out = None
        for _ in range(warmup):
            out = fn()
        jax.block_until_ready(out)
        mem_before = memory_snapshot()
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        mem_after = memory_snapshot()
        leaves = jax.tree_util.tree_leaves(out)
        res = BenchResult(
            name=name, iters=iters, min_s=min(times),
            avg_s=sum(times) / len(times), max_s=max(times),
            samples_per_call=samples_per_call,
            hbm_bytes_per_call=hbm_bytes_per_call,
            flops_per_call=flops_per_call,
            checksum=checksum(*leaves[:2]),
            mem_before=mem_before, mem_after=mem_after,
        )
        self.results.append(res)
        return res

    def report(self) -> str:
        specs = device_specs()
        lines = [f"device: {specs['kind']}"]
        for r in self.results:
            ms = r.min_s * 1e3
            line = f"{r.name:40s} min {ms:9.3f} ms  avg {r.avg_s*1e3:9.3f} ms"
            if r.msamples_per_s is not None:
                line += f"  {r.msamples_per_s:10.1f} MS/s"
            roof = r.roofline(specs)
            if "hbm_fraction" in roof:
                line += f"  hbm {100*roof['hbm_fraction']:5.1f}%"
            if "mxu_fraction_f32" in roof:
                line += f"  mxu {100*roof['mxu_fraction_f32']:5.1f}%"
            growth = r.hbm_growth_bytes
            if growth is not None and (r.mem_after or {}).get("hbm_in_use_bytes"):
                line += f"  hbmΔ {growth/1e6:+.1f}MB"
            line += f"  sum {r.checksum:.6g}"
            lines.append(line)
        mem = memory_snapshot()
        if mem["hbm_in_use_bytes"] or mem["host_rss_bytes"]:
            lines.append(
                f"memory: hbm live {mem['hbm_in_use_bytes']/1e6:.1f} MB, "
                f"hbm peak {mem['hbm_peak_bytes']/1e6:.1f} MB, "
                f"host rss {mem['host_rss_bytes']/1e6:.1f} MB")
        return "\n".join(lines)
