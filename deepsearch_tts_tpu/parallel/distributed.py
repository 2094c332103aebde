"""Multi-host initialization and cross-slice mesh construction.

The reference has no distributed layer (SURVEY.md §2.3); this is the DCN
story for the TPU build: ``jax.distributed.initialize`` across hosts, then a
mesh whose outer (``dp``) axis spans slices over DCN while inner axes
(``ep``/``tp``) stay within a slice on ICI — so the heavy collectives
(all-to-all for experts, psum for TP) never cross the data-center network.
"""
from __future__ import annotations

import os

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed from args or standard env vars.

    No-op when single-process (the common dev case).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", 0)),
    )


def cross_slice_mesh(tp: int = 1, ep: int = 1, fsdp: int = 1):
    """Mesh with dp spanning hosts/slices (DCN) and ep/tp innermost (ICI).

    Uses jax's device order (hosts are contiguous), so reshaping
    [dp, fsdp, ep, tp] keeps each inner group within one slice as long as
    fsdp*ep*tp divides the per-slice device count.
    """
    from .mesh import make_mesh

    n = len(jax.devices())
    inner = tp * ep * fsdp
    if n % inner:
        raise ValueError(f"{n} devices not divisible by fsdp*ep*tp={inner}")
    return make_mesh(dp=n // inner, fsdp=fsdp, ep=ep, tp=tp)
