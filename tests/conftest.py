"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

# XLA_FLAGS must be set before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize (PYTHONPATH=.axon_site) re-exports
# JAX_PLATFORMS pointing at the TPU tunnel at interpreter startup, so the env
# var alone is not enough — override through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

REFERENCE_PATH = os.environ.get("NYLON_REFERENCE_PATH", "/root/reference")

requires_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_PATH, "hftt_code")),
    reason="PyTorch reference checkout not available",
)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
