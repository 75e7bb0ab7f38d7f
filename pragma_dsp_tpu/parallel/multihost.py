"""Multi-host runtime bring-up (SURVEY.md §5 failure-detection row).

On a multi-host pod slice each host runs the same program;
``init_multihost`` wires them into one JAX runtime and runs a
psum barrier as a startup health check so a dead host fails fast and
loud instead of hanging the first collective mid-pipeline.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

__all__ = ["init_multihost", "barrier", "is_multihost"]


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit or env-provided topology
    (on Cloud TPU all args are auto-detected), then a barrier health
    check across all hosts."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    barrier()


def is_multihost() -> bool:
    return jax.process_count() > 1


def barrier() -> None:
    """All-host barrier: a tiny psum across every device; raises (rather
    than hanging forever) if the runtime is unhealthy enough to fail the
    collective."""
    if jax.process_count() == 1 and len(jax.devices()) == 1:
        return
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("all",))
    ones = jax.device_put(
        jnp.ones((len(devs),), jnp.int32),
        NamedSharding(mesh, P("all")))
    total = int(jax.jit(lambda v: jnp.sum(v))(ones))
    if total != len(devs):
        raise RuntimeError(
            f"barrier psum mismatch: {total} != {len(devs)} devices")
