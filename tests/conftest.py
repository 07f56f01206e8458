"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run on
XLA's host-platform device emulation (SURVEY.md §7 / build environment).
Must run before jax initializes, hence top of conftest.
"""

import os

# hard override: the environment pins JAX_PLATFORMS=axon (real TPU) and the
# sitecustomize registers that backend at interpreter start; tests must run
# on the virtual 8-device CPU backend. XLA_FLAGS must be set before the
# backend initializes; jax.config.update overrides the sitecustomize pin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def small_shape():
    # small spatial size, still divisible by 32 (encoder downsampling)
    return 64, 96
