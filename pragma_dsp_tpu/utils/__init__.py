"""Utilities: fixture loading / SNR harness, roofline bench harness."""

from .benchharness import BenchContext, BenchResult, checksum, device_specs
from .fixtures import (
    assert_close,
    assert_snr,
    fixtures_dir,
    load_json,
    max_abs_error,
    rms_error,
    snr_db,
)

__all__ = [
    "BenchContext",
    "BenchResult",
    "checksum",
    "device_specs",
    "assert_close",
    "assert_snr",
    "fixtures_dir",
    "load_json",
    "max_abs_error",
    "rms_error",
    "snr_db",
]
