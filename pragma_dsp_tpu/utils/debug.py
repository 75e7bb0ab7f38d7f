"""Debug / sanitizer utilities (SURVEY.md §5 "race detection / sanitizers").

There are no data races in this model — everything is functional — so the
"sanitizer build" means: run Pallas kernels in interpreter mode, check for
NaN/Inf at stage boundaries, and make failures loud. The reference's
analogue is TypeScript strict + noUncheckedIndexedAccess (tsconfig).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["sanitizer_mode", "check_finite", "debug_nans"]


@contextlib.contextmanager
def sanitizer_mode():
    """Run the enclosed block with every Pallas kernel interpreted
    (pltpu.force_tpu_interpret_mode) and jax NaN-checking enabled —
    slow, exact, loud. The 'sanitizer build' of SURVEY.md §5."""
    from jax.experimental.pallas import tpu as pltpu

    prev_nans = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        with pltpu.force_tpu_interpret_mode():
            yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Toggle jax_debug_nans for a block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(name: str, *arrays) -> None:
    """jit-compatible finiteness assertion at a pipeline stage boundary:
    aborts with ``name`` in the message when any element is NaN/Inf
    (uses jax.debug.check semantics via checkify-free error)."""
    for i, a in enumerate(arrays):
        ok = jnp.all(jnp.isfinite(a))
        def _report(okv, arr=None, idx=i):
            if not bool(okv):
                raise FloatingPointError(
                    f"check_finite failed at '{name}' (array {idx})")
        jax.debug.callback(_report, ok)
