"""Checkpoint / resume for streaming pipeline state (SURVEY.md §5).

Streaming DSP carries state between chunks — STFT tails, FIR delay
lines, discriminator history, PFB block history — all represented as
explicit NamedTuple pytrees (stream.StftState, ops.fir.FirState,
ops.demod.FmDemodState, ops.channelizer.PfbState). Long-running
capture/serve jobs persist them with orbax when available, with a
numpy .npz fallback so checkpointing works in minimal environments.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_state", "restore_state"]


def _try_orbax():
    try:
        import orbax.checkpoint as ocp  # type: ignore

        return ocp
    except Exception:
        return None


def save_state(path: str, state: Any) -> str:
    """Persist a pytree of arrays. Uses orbax if importable, else .npz.

    Returns the path actually written.
    """
    ocp = _try_orbax()
    if ocp is not None:
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
        ckptr.wait_until_finished()
        return path
    leaves, treedef = jax.tree_util.tree_flatten(state)
    npz = path if path.endswith(".npz") else path + ".npz"
    np.savez(npz, *[np.asarray(l) for l in leaves])
    return npz


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`; ``like`` supplies the
    pytree structure (e.g. a freshly-initialised state)."""
    ocp = _try_orbax()
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree_util.tree_map(np.asarray, like)
        restored = ckptr.restore(os.path.abspath(path), target)
        import jax.numpy as jnp

        return jax.tree_util.tree_map(jnp.asarray, restored)
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves = [data[k] for k in data.files]
    treedef = jax.tree_util.tree_structure(like)
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])
