"""Worker for the two-process jax.distributed test (test_distributed.py).

Run: python _dist_worker.py <coordinator> <num_processes> <process_id>
Prints PSUM=<v> and GATHER=<list> lines the parent asserts on.
"""
import os
import sys

# 2 virtual CPU devices per process; must be set before backend init. The
# axon sitecustomize force-registers the TPU plugin, so the platform must be
# pinned to cpu via jax.config BEFORE any backend touch (a second
# TPU-claiming process would block forever).
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, num_processes, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from deepsearch_tts_tpu.parallel.distributed import (
        cross_slice_mesh,
        initialize_multihost,
    )

    initialize_multihost(coordinator, num_processes=num_processes,
                         process_id=pid)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 2 * num_processes

    # cross-process allgather through the coordination service
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.array([pid], np.int32))
    print(f"GATHER={sorted(int(x) for x in gathered.ravel())}", flush=True)

    # dp axis spans the two processes (DCN in production), tp stays local
    # (ICI): a jitted global sum must cross the process boundary
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = cross_slice_mesh(tp=2)
    assert mesh.shape["dp"] == num_processes and mesh.shape["tp"] == 2
    sharding = NamedSharding(mesh, PartitionSpec(("dp",)))
    local = np.full((2,), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local,
                                                 (2 * num_processes,))
    out = jax.jit(jnp.sum,
                  out_shardings=NamedSharding(mesh, PartitionSpec()))(arr)
    print(f"PSUM={float(out)}", flush=True)


if __name__ == "__main__":
    main()
