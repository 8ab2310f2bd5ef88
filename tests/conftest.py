"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver validates multi-chip sharding the same way
(xla_force_host_platform_device_count); real-TPU benchmarking happens in
bench.py, not the test suite.

NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env var, so the
platform must be forced through jax.config before any computation.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax
import pytest

from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

jax.config.update("jax_platforms", "cpu")
enable_compile_cache()

REF = "/root/reference/UR5+gripper"


def ref_scene(name: str) -> str:
    return os.path.join(REF, name)


@pytest.fixture(scope="module")
def x64():
    """Enable f64 for tight numeric parity tests. Module-scoped so x64 is
    switched OFF again before the next test module runs (a session-scoped
    version leaked x64 into every module sorted after the first user)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
