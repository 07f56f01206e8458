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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This box has ONE schedulable core. XLA:CPU collectives rendezvous with a
# hardcoded 40 s termination timeout; 8 per-device threads time-sharing one
# core can miss it under load, and XLA then F-aborts the whole process
# (rendezvous.cc "Exiting to ensure a consistent program state"), which
# killed full-suite runs at random mesh tests. Raise both timeouts.
if "collective_call_terminate_timeout" not in flags:
    flags = (
        flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()
os.environ["XLA_FLAGS"] = flags

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


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full suite; default skips them "
        "to keep a dev run under ~20 min on this 1-core box)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
