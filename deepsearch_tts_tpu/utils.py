"""Small shared utilities."""
from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True when running on real TPU hardware.

    The axon PJRT plugin reports platform name 'axon' while exposing TPU
    devices, so checking default_backend() == 'tpu' alone misses it.
    """
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return any("TPU" in getattr(d, "device_kind", "") for d in jax.devices())
    except Exception:
        return False


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Pin this process to the CPU backend (beats the axon sitecustomize).

    Must run before any JAX backend initialization.
    """
    import os

    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
