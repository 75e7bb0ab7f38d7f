"""Utilities: fixture/SNR harness, roofline bench harness, profiling,
sanitizer mode, checkpointing."""

from .benchharness import BenchContext, BenchResult, checksum, device_specs
from .checkpoint import restore_state, save_state
from .debug import check_finite, debug_nans, sanitizer_mode
from .fixtures import (
    assert_close,
    assert_snr,
    fixtures_dir,
    load_json,
    max_abs_error,
    rms_error,
    snr_db,
)
from .profiling import annotate, timed, trace

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
    "save_state",
    "restore_state",
    "check_finite",
    "debug_nans",
    "sanitizer_mode",
    "annotate",
    "timed",
    "trace",
]
