"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

The reference repo has no automated tests at all (SURVEY.md §4); this suite is
new. Multi-chip sharding paths are validated on a virtual CPU mesh per
jax's xla_force_host_platform_device_count mechanism.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from deepsearch_tts_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    return make_mesh(dp=2, tp=4)
