"""Two-process jax.distributed.initialize over localhost (CPU backend).

Exercises parallel/distributed.py end-to-end: coordinator bring-up, the
cross-slice mesh with dp spanning processes, a cross-process allgather, and
a jitted global reduction whose collective crosses the process boundary —
the DCN story SURVEY.md §2.3 asks for, validated without TPU hardware.
(The reference has no distributed layer at all.)
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mesh():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "GATHER=[0, 1]" in out, out
        # global array [1, 1, 2, 2] summed across both processes
        assert "PSUM=6.0" in out, out


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    """Single-process dev path: no coordinator configured → no-op (no
    jax.distributed state is touched)."""
    from deepsearch_tts_tpu.parallel.distributed import initialize_multihost

    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    initialize_multihost()  # must not raise or initialize anything
