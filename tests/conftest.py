"""Test configuration: force an 8-device virtual CPU mesh.

The image's axon sitecustomize registers the TPU backend at interpreter
start and overrides the JAX_PLATFORMS env var, so we must use
jax.config.update (before any backend initialization) to pin tests to CPU.
Multi-chip sharding paths are validated on the virtual CPU mesh per jax's
xla_force_host_platform_device_count mechanism.

(The reference repo has no automated tests at all — SURVEY.md §4; this
suite is new.)
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from deepsearch_tts_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, f"expected 8 cpu devices, got {jax.devices()}"
    return make_mesh(dp=2, tp=4)
